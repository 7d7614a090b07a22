"""Golden-parity tests for the Flax DPT depth estimator vs the torch
reference implementation (transformers DPTForDepthEstimation — the HF port
of the MiDaS DPT_Large the reference loads via torch.hub,
preprocess.py:69-70). Same strategy as the other model goldens: random-init
tiny torch model -> convert_dpt_state_dict -> value-level allclose."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tokenflow_tpu.models import dpt as dpt_lib
from tokenflow_tpu.models.weights import (
    assert_params_match,
    convert_dpt_state_dict,
)


def tiny_configs():
    hf = transformers.DPTConfig(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=2,
        intermediate_size=64,
        image_size=64,
        patch_size=16,
        backbone_out_indices=[0, 1, 2, 3],
        neck_hidden_sizes=[8, 12, 16, 16],
        fusion_hidden_size=16,
        attn_implementation="eager",
    )
    return hf, dpt_lib.DPTConfig.tiny()


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw", [((4, 4), (8, 8)), ((5, 7), (16, 16)), ((8, 8), (3, 5))]
)
def test_resize_bilinear_matches_torch(align_corners, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    ours = dpt_lib.resize_bilinear(
        jnp.asarray(x), out_hw, align_corners=align_corners
    )
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=out_hw,
        mode="bilinear",
        align_corners=align_corners,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-5
    )


def test_dpt_matches_transformers_golden():
    hf_cfg, cfg = tiny_configs()
    torch.manual_seed(0)
    ref = transformers.DPTForDepthEstimation(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    model = dpt_lib.DPTDepthModel(cfg)
    params = convert_dpt_state_dict(sd, cfg)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    # structure check against the model's own init
    expected = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.asarray(x)
    )["params"]
    assert_params_match(params, jax.tree.map(lambda s: s, expected))

    ours = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).predicted_depth.numpy()
    assert ours.shape == theirs.shape == (2, 64, 64)
    np.testing.assert_allclose(
        np.asarray(ours), theirs, rtol=2e-4, atol=2e-4
    )


def test_dpt_non_native_input_size():
    """Pos-embed grid interpolation path: input grid != checkpoint grid
    (the reference's MiDaS transform emits multiples-of-32, not always the
    384 the pos embed was trained at). Square size because the HF torch
    reference's reassemble reshape only supports square grids on the
    non-backbone path; the Flax model also accepts non-square inputs."""
    hf_cfg, cfg = tiny_configs()
    torch.manual_seed(2)
    ref = transformers.DPTForDepthEstimation(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    model = dpt_lib.DPTDepthModel(cfg)
    params = convert_dpt_state_dict(sd, cfg)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    ours = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).predicted_depth.numpy()
    assert ours.shape == theirs.shape == (1, 96, 96)
    np.testing.assert_allclose(
        np.asarray(ours), theirs, rtol=2e-4, atol=2e-4
    )

    # non-square still runs through the Flax model (shape-only check)
    x2 = jnp.asarray(
        rng.standard_normal((1, 96, 128, 3)).astype(np.float32)
    )
    assert model.apply({"params": params}, x2).shape == (1, 96, 128)


def test_compute_dpt_depth_from_checkpoint(tmp_path):
    """The TOKENFLOW_MIDAS_CKPT path: checkpoint file -> per-frame depth
    conditioning arrays, with raw predictions cached to depth/%05d.npy
    (reference analog: preprocess.py:76-111 torch.hub MiDaS per frame)."""
    cv2 = pytest.importorskip("cv2")
    from tokenflow_tpu.io import depth as depth_lib

    hf_cfg, cfg = tiny_configs()
    torch.manual_seed(4)
    ref = transformers.DPTForDepthEstimation(hf_cfg).eval()
    ckpt = tmp_path / "dpt_tiny.bin"
    torch.save(ref.state_dict(), ckpt)

    data = tmp_path / "video"
    data.mkdir()
    rng = np.random.default_rng(5)
    n_frames = 3
    for i in range(n_frames):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(data / f"{i:05d}.png"), img)

    out = depth_lib.compute_dpt_depth(
        str(data), n_frames, (8, 8), str(ckpt),
        batch=2, input_size=64, config=cfg,
    )
    assert out.shape == (n_frames, 8, 8, 1)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    # raw predictions cached -> the precomputed-npy path now engages
    assert (data / "depth" / "00000.npy").exists()
    again = depth_lib.load_or_compute_depth(str(data), n_frames, (8, 8))
    np.testing.assert_allclose(again, out, rtol=1e-5, atol=1e-5)
