"""COMPOSED edit-loop torch golden (VERDICT round-2 missing #1).

Every editing op has a per-op golden (test_ops.py numpy mirrors of
tokenflow_utils.py; test_torch_goldens.py torch mirrors of the model
blocks), but until this file nothing checked that their *composition* —
pivotal pass -> per-site cache -> NN propagation -> 3-stream CFG -> DDIM
step, across steps with the injection gates — matches an independent
implementation of the reference's editing stack.

This file transcribes the reference's editing semantics VERBATIM as torch
test code (float64, stream-major batches, per-window python loops, hook
state as an explicit dict):

  - extended attention with the per-frame source stream and flattened-KV
    uncond/cond streams  (/root/reference/tokenflow_utils.py:106-214)
  - PnP q/k injection on decoder res_dict {1:[1,2],2:[0..2],3:[0..2]}
    sites and conv-f injection at up_blocks[1].resnets[1]
    (/root/reference/tokenflow_utils.py:49-130,208-214)
  - TokenFlowBlock pivotal caching + two-pivot sigmoid-blend propagation
    (/root/reference/tokenflow_utils.py:296-429)
  - the 3-stream batch, [inv|uncond|cond] embeds, 3-way CFG and
    DDIMScheduler.step (/root/reference/run_tokenflow_pnp.py:195-233)

and runs the SAME weights (through convert_unet_state_dict) and the SAME
pinned pivot table through tokenflow_sample_loop. A stream-ordering,
gate-off-by-one, cache-wiring or schedule-indexing bug in the composed
jit-scanned loop fails this test; the repo-vs-itself tests
(fused-vs-two-pass, sharded-vs-single) cannot catch those.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from test_torch_goldens import (  # noqa: E402
    _build_controlnet_sd,
    _build_unet_sd,
    _conv,
    _gn,
    _lin,
    _ln,
    torch_attention,
    torch_controlnet,
    torch_geglu_ff,
    torch_resnet,
    torch_timestep_embedding,
    torch_unet,
)

from tokenflow_tpu.diffusion import ddim  # noqa: E402
from tokenflow_tpu.editing import pipeline  # noqa: E402
from tokenflow_tpu.models import weights as W  # noqa: E402
from tokenflow_tpu.models.unet2d import (  # noqa: E402
    UNet2DConfig,
    UNet2DConditionModel,
)

# ---------------------------------------------------------------------------
# torch mirror of the reference editing semantics (stream-major everywhere)
# ---------------------------------------------------------------------------


def t_ext_attn(x, sd, p, heads, inject_qk):
    """Extended attention, reference tokenflow_utils.py:114-199.

    x: (3n, s, dim) normed hidden states, STREAM-MAJOR [src | uncond | cond].
    Source stream: per-frame self-attention. Uncond/cond: each frame's
    queries attend over all n frames' K/V jointly. ``inject_qk`` overwrites
    the uncond/cond q,k with the source stream's (v NOT injected,
    tokenflow_utils.py:124-130).
    """
    b, s, dim = x.shape
    n = b // 3
    q = _lin(x, sd, f"{p}.to_q")
    k = _lin(x, sd, f"{p}.to_k")
    v = _lin(x, sd, f"{p}.to_v")
    if inject_qk:
        q = torch.cat([q[:n], q[:n], q[:n]])
        k = torch.cat([k[:n], k[:n], k[:n]])
    d = dim // heads
    scale = d**-0.5

    def split(t_, length):
        return t_.reshape(-1, length, heads, d).permute(0, 2, 1, 3)

    outs = []
    for si in range(3):
        sl = slice(si * n, (si + 1) * n)
        qs = split(q[sl], s)  # (n, h, s, d)
        if si == 0:
            ks, vs = split(k[sl], s), split(v[sl], s)
        else:
            # (1, n*s, dim).repeat(n) — tokenflow_utils.py:133-138
            ks = split(k[sl].reshape(1, n * s, dim).repeat(n, 1, 1), n * s)
            vs = split(v[sl].reshape(1, n * s, dim).repeat(n, 1, 1), n * s)
        probs = torch.softmax(qs @ ks.transpose(-1, -2) * scale, dim=-1)
        outs.append((probs @ vs).permute(0, 2, 1, 3).reshape(n, s, dim))
    return _lin(torch.cat(outs, dim=0), sd, f"{p}.to_out.0")


def t_tokenflow_block(x, ctx, sd, p, heads, state, inject_qk_site):
    """TokenFlowBlock.forward, reference tokenflow_utils.py:300-427."""
    b, s, dim = x.shape
    n = b // 3
    norm = _ln(x, sd, f"{p}.norm1")
    if state["pivotal"]:
        state["pivot_h"][p] = norm.reshape(3, n, s, dim).clone()
        attn_out = t_ext_attn(
            norm, sd, f"{p}.attn1", heads,
            inject_qk_site and state["qk_on"],
        )
        state["kf_attn"][p] = attn_out.clone()
    else:
        bi = state["batch_idx"]
        batch_idxs = [bi] + ([bi - 1] if bi > 0 else [])
        pivot_h = state["pivot_h"][p]  # (3, kf, s, dim)
        kf_attn = state["kf_attn"][p]  # (3*kf, s, dim)
        kf = kf_attn.shape[0] // 3

        def l2n(a):
            return a / a.norm(dim=-1, keepdim=True)

        # batch_cosine_sim on the source stream only (util.py:61-69,
        # tokenflow_utils.py:335-336)
        xq = norm.reshape(3, n, s, dim)[0].reshape(-1, dim)
        pk = pivot_h[0][batch_idxs].reshape(-1, dim)
        sim = l2n(xq) @ l2n(pk).T
        ao = kf_attn.reshape(3, kf, s, dim)[:, batch_idxs]
        if len(batch_idxs) == 2:
            sim1, sim2 = sim.chunk(2, dim=1)
            idx1 = torch.stack([sim1.argmax(dim=-1)] * 3)
            idx2 = torch.stack([sim2.argmax(dim=-1)] * 3)
            a1 = ao[:, 0].gather(1, idx1.unsqueeze(-1).repeat(1, 1, dim))
            a2 = ao[:, 1].gather(1, idx2.unsqueeze(-1).repeat(1, 1, dim))
            # assumed mid-window pivot + sigmoid squash quirks
            # (tokenflow_utils.py:375-388)
            s_pos = (
                torch.arange(n, dtype=torch.float64) + batch_idxs[0] * n
            )
            p1 = batch_idxs[0] * n + n // 2
            p2 = batch_idxs[1] * n + n // 2
            d1 = (s_pos - p1).abs()
            d2 = (s_pos - p2).abs()
            w1 = torch.sigmoid(d2 / (d1 + d2))
            w1 = w1[None, :, None, None]
            a1 = a1.reshape(3, n, s, dim)
            a2 = a2.reshape(3, n, s, dim)
            attn_out = (w1 * a1 + (1 - w1) * a2).reshape(b, s, dim)
        else:
            idx1 = torch.stack([sim.argmax(dim=-1)] * 3)
            attn_out = (
                ao[:, 0]
                .gather(1, idx1.unsqueeze(-1).repeat(1, 1, dim))
                .reshape(b, s, dim)
            )
    x = x + attn_out
    x = x + torch_attention(
        _ln(x, sd, f"{p}.norm2"), ctx, sd, f"{p}.attn2", heads
    )
    x = x + torch_geglu_ff(_ln(x, sd, f"{p}.norm3"), sd, p)
    return x


def t_t2d_edit(x, ctx, sd, p, heads, linear, state, inject_qk_site):
    b, c, hh, ww = x.shape
    res = x
    h = _gn(x, sd, f"{p}.norm", 32, 1e-6)
    if linear:
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = _lin(h, sd, f"{p}.proj_in")
    else:
        h = _conv(h, sd, f"{p}.proj_in", padding=0)
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, h.shape[1])
    h = t_tokenflow_block(
        h, ctx, sd, f"{p}.transformer_blocks.0", heads, state,
        inject_qk_site,
    )
    if linear:
        h = _lin(h, sd, f"{p}.proj_out")
        h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    else:
        h = h.reshape(b, hh, ww, -1).permute(0, 3, 1, 2)
        h = _conv(h, sd, f"{p}.proj_out", padding=0)
    return h + res


def t_resnet_inject(x, temb, sd, p, inject_conv, groups=32, eps=1e-5):
    """ResnetBlock2D with post-conv2 source injection into the uncond and
    cond thirds (reference conv_forward, tokenflow_utils.py:51-98; the
    shortcut path is NOT injected)."""
    h = F.silu(_gn(x, sd, f"{p}.norm1", groups, eps))
    h = _conv(h, sd, f"{p}.conv1")
    if temb is not None and f"{p}.time_emb_proj.weight" in sd:
        h = h + _lin(F.silu(temb), sd, f"{p}.time_emb_proj")[:, :, None, None]
    h = F.silu(_gn(h, sd, f"{p}.norm2", groups, eps))
    h = _conv(h, sd, f"{p}.conv2")
    if inject_conv:
        nsrc = h.shape[0] // 3
        h = torch.cat([h[:nsrc], h[:nsrc], h[:nsrc]])
    if f"{p}.conv_shortcut.weight" in sd:
        x = _conv(x, sd, f"{p}.conv_shortcut", padding=0)
    return x + h


def torch_unet_edit(x, t, ctx, sd, cfg, state, residuals=None):
    """torch_unet (test_torch_goldens) with the TokenFlow surgery applied
    at the reference's sites: TokenFlowBlocks everywhere, PnP q/k
    injection on decoder res_dict {1:[1,2],2:[0,1,2],3:[0,1,2]}
    (tokenflow_utils.py:208-214), conv-f at up_blocks[1].resnets[1].
    ``residuals`` = (down_list, mid) ControlNet residuals, added to the
    skips / after the mid block exactly as diffusers' UNet consumes them
    (unet2d.py:169-181)."""
    chans = list(cfg.block_out_channels)
    n = len(chans)
    tb = torch.full((x.shape[0],), int(t))
    temb = torch_timestep_embedding(
        tb, chans[0], cfg.flip_sin_to_cos, cfg.freq_shift
    )
    temb = _lin(temb, sd, "time_embedding.linear_1")
    temb = _lin(F.silu(temb), sd, "time_embedding.linear_2")
    h = _conv(x, sd, "conv_in")
    skips = [h]
    for i in range(n):
        for j in range(cfg.layers_per_block):
            h = torch_resnet(h, temb, sd, f"down_blocks.{i}.resnets.{j}")
            if cfg.attn_down[i]:
                h = t_t2d_edit(
                    h, ctx, sd, f"down_blocks.{i}.attentions.{j}",
                    cfg.num_heads[i], cfg.use_linear_projection, state,
                    inject_qk_site=False,
                )
            skips.append(h)
        if i < n - 1:
            h = _conv(
                h, sd, f"down_blocks.{i}.downsamplers.0.conv",
                stride=2, padding=1,
            )
            skips.append(h)
    if residuals is not None:
        skips = [s + r for s, r in zip(skips, residuals[0])]
    h = torch_resnet(h, temb, sd, "mid_block.resnets.0")
    h = t_t2d_edit(
        h, ctx, sd, "mid_block.attentions.0", cfg.num_heads[-1],
        cfg.use_linear_projection, state, inject_qk_site=False,
    )
    h = torch_resnet(h, temb, sd, "mid_block.resnets.1")
    if residuals is not None:
        h = h + residuals[1]
    for i in range(n):
        level = n - 1 - i
        for j in range(cfg.layers_per_block + 1):
            h = torch.cat([h, skips.pop()], dim=1)
            h = t_resnet_inject(
                h, temb, sd, f"up_blocks.{i}.resnets.{j}",
                inject_conv=state["conv_on"] and (i == 1 and j == 1),
            )
            if cfg.attn_up[i]:
                inj = (i == 1 and j in (1, 2)) or i in (2, 3)
                h = t_t2d_edit(
                    h, ctx, sd, f"up_blocks.{i}.attentions.{j}",
                    cfg.num_heads[level], cfg.use_linear_projection,
                    state, inject_qk_site=inj,
                )
        if i < n - 1:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv(h, sd, f"up_blocks.{i}.upsamplers.0.conv")
    h = F.silu(_gn(h, sd, "conv_norm_out", 32, cfg.norm_eps))
    return _conv(h, sd, "conv_out")


def torch_edit_loop(
    sd, cfg, x0, traj, save_ts, inv_e, unc_e, cond_e,
    timesteps, step_ratio, qk_sched, conv_sched, pivots, ws, g,
    cn=None, depth=None,
):
    """The reference sample loop (run_tokenflow_pnp.py:195-233,264-267):
    per step one pivotal pass (result discarded, hook caches kept) then
    per-window propagation passes with 3-way CFG and the DDIM step,
    everything float64 stream-major. ``cn`` = (cn_sd, cond_frames): a
    ControlNet (torch_controlnet mirror) runs on every pass's 3-stream
    batch with the per-frame conditioning image repeated per stream, its
    residuals fed to the UNet (the conditioned-editor composition,
    cli/run_controlnet.py)."""
    betas = (
        torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64)
        ** 2
    )
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    final_alpha = alphas_cumprod[0]
    slot_of = {int(tt): i for i, tt in enumerate(save_ts)}
    f_total = x0.shape[0]
    x = x0.clone()

    def embeds(nf):
        # [inv x n, uncond x n, cond x n] (run_tokenflow_pnp.py:206-207)
        return torch.cat(
            [inv_e.repeat(nf, 1, 1), unc_e.repeat(nf, 1, 1),
             cond_e.repeat(nf, 1, 1)]
        )

    for si, t in enumerate(timesteps):
        t = int(t)
        src = traj[slot_of[t]]
        piv = torch.as_tensor(
            np.array(pivots[si], copy=True), dtype=torch.long
        )
        state = {
            "pivotal": True,
            "batch_idx": None,
            "qk_on": t in qk_sched,
            "conv_on": t in conv_sched,
            "pivot_h": {},
            "kf_attn": {},
        }
        def cn_residuals(inp, cond_sel, e):
            if cn is None:
                return None
            cn_sd, cond = cn
            tb = torch.full((inp.shape[0],), t)
            return torch_controlnet(
                inp, tb, e, torch.cat([cond[cond_sel]] * 3), cn_sd, cfg
            )

        def wd(z, sel):
            # depth-conditioned UNet: per-frame depth map concatenated to
            # the latent channels of EVERY stream (the reference cats the
            # depth to each batch segment, run_tokenflow_pnp.py:200-201)
            if depth is None:
                return z
            return torch.cat([z, depth[sel]], dim=1)

        inp = torch.cat([wd(src[piv], piv), wd(x[piv], piv), wd(x[piv], piv)])
        e_piv = embeds(len(piv))
        torch_unet_edit(
            inp, t, e_piv, sd, cfg, state,
            residuals=cn_residuals(inp, piv, e_piv),
        )  # discard
        state["pivotal"] = False
        new_x = []
        for wi, b0 in enumerate(range(0, f_total, ws)):
            state["batch_idx"] = wi
            xb = x[b0 : b0 + ws]
            sel = slice(b0, b0 + ws)
            inp = torch.cat([wd(src[sel], sel), wd(xb, sel), wd(xb, sel)])
            e_w = embeds(ws)
            pred = torch_unet_edit(
                inp, t, e_w, sd, cfg, state,
                residuals=cn_residuals(inp, slice(b0, b0 + ws), e_w),
            )
            _, u, c = pred.chunk(3)
            eps = u + g * (c - u)
            a_t = alphas_cumprod[t]
            pt = t - step_ratio
            a_prev = alphas_cumprod[pt] if pt >= 0 else final_alpha
            x0_pred = (xb - (1 - a_t) ** 0.5 * eps) / a_t**0.5
            new_x.append(
                a_prev**0.5 * x0_pred + (1 - a_prev) ** 0.5 * eps
            )
        x = torch.cat(new_x)
    return x


# ---------------------------------------------------------------------------
# the goldens
# ---------------------------------------------------------------------------

F_TOTAL, WS, HW = 4, 2, 16


@pytest.fixture(scope="module")
def stack():
    cfg = UNet2DConfig.tiny()
    sd = _build_unet_sd(cfg, seed=21)
    params = W.convert_unet_state_dict(
        {k: v.numpy().astype(np.float32) for k, v in sd.items()}
    )
    model = UNet2DConditionModel(cfg)

    rng = np.random.default_rng(22)
    x0 = rng.standard_normal((F_TOTAL, 4, HW, HW)) * 0.8
    embeds = rng.standard_normal((3, 7, cfg.cross_attention_dim)) * 0.5

    def unet_apply(p, sample, t, ctx, edit, **kw):
        return model.apply(p, sample, t, ctx, edit=edit, **kw)

    return cfg, sd, params, unet_apply, x0, embeds


def _run_both(
    stack, steps, pnp_attn_t, pnp_f_t, pnp, start=None, cn=False,
    depth=False,
):
    cfg, sd, params, unet_apply, x0, embeds = stack

    depth_np = d_jax = d_torch = None
    if depth:
        depth_np = (
            np.random.default_rng(88).standard_normal((F_TOTAL, 1, HW, HW))
            * 0.7
        )
        d_jax = jnp.asarray(depth_np.transpose(0, 2, 3, 1), jnp.float32)
        d_torch = torch.tensor(depth_np, dtype=torch.float64)

    controlnet_fn = cond_image = cn_pair = None
    if cn:
        from tokenflow_tpu.models.controlnet import ControlNetModel

        cn_sd = _build_controlnet_sd(cfg, seed=23)
        cn_params = W.convert_controlnet_state_dict(
            {k: v.numpy().astype(np.float32) for k, v in cn_sd.items()}
        )
        cn_model = ControlNetModel(cfg)
        cond_np = (
            np.random.default_rng(77).standard_normal(
                (F_TOTAL, 3, HW * 8, HW * 8)
            )
            * 0.5
        )

        def controlnet_fn(sample, t, ctx, cond):
            return cn_model.apply({"params": cn_params}, sample, t, ctx, cond)

        cond_image = jnp.asarray(cond_np.transpose(0, 2, 3, 1), jnp.float32)
        cn_pair = (cn_sd, torch.tensor(cond_np, dtype=torch.float64))

    sched_full = ddim.make_schedule(steps)
    sched = (
        ddim.truncate_schedule(sched_full, start)
        if start is not None
        else sched_full
    )
    save_ts = sched_full.timesteps[::-1].copy()  # ascending save grid
    # deterministic per (steps,) so runs with different gates share the
    # trajectory and the gate-sensitivity assertion below is meaningful
    traj = np.random.default_rng(1000 + steps).standard_normal(
        (steps, F_TOTAL, 4, HW, HW)
    ) * 0.8
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=pnp_attn_t, pnp_f_t=pnp_f_t
    )
    n_steps = len(sched.timesteps)
    n_windows = F_TOTAL // WS
    pivots = np.asarray(
        pipeline.choose_pivots(
            jax.random.PRNGKey(3), n_steps, n_windows, WS
        )
    )

    # ---- jax side: the jit-scanned composed loop, pinned pivots
    out = pipeline.tokenflow_sample_loop(
        unet_apply,
        {"params": params},
        jnp.asarray(x0.transpose(0, 2, 3, 1), jnp.float32),
        jnp.asarray(traj.transpose(0, 1, 3, 4, 2), jnp.float32),
        jnp.asarray(embeds, jnp.float32),
        schedule,
        window_size=WS,
        guidance_scale=7.5,
        pnp=pnp,
        rng=jax.random.PRNGKey(0),  # unused: pivots pinned
        pivot_indices=pivots,
        controlnet_fn=controlnet_fn,
        cond_image=cond_image,
        depth=d_jax,
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)

    # ---- torch side: independent float64 reference-semantics mirror
    # (injection schedules by timestep membership, the reference's t-in-
    # schedule form, run_tokenflow_pnp.py:235-240 — qk/conv_n of the FULL
    # n_timesteps, tokenflow gates by step index; both must agree)
    qk_n = int(steps * pnp_attn_t)
    conv_n = int(steps * pnp_f_t)
    qk_sched = {int(t) for t in sched.timesteps[:qk_n]} if pnp else set()
    conv_sched = {int(t) for t in sched.timesteps[:conv_n]} if pnp else set()
    e = torch.tensor(embeds, dtype=torch.float64)
    ref = torch_edit_loop(
        sd, cfg,
        torch.tensor(x0, dtype=torch.float64),
        torch.tensor(traj, dtype=torch.float64),
        save_ts,
        e[0:1], e[1:2], e[2:3],
        sched.timesteps,
        1000 // steps,
        qk_sched, conv_sched,
        pivots, WS, 7.5,
        cn=cn_pair, depth=d_torch,
    )
    return out, ref.numpy()


def test_composed_pnp_edit_matches_reference_semantics(stack):
    """3 steps of the full PnP edit (qk gate on for step 0 only, conv gate
    for steps 0-1 -> both gate transitions exercised; 2 windows -> both
    the single-pivot window-0 path and the two-pivot sigmoid blend)."""
    out, ref = _run_both(stack, steps=3, pnp_attn_t=0.5, pnp_f_t=0.8, pnp=True)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
    # and the mirror is actually sensitive to the injection gates
    out2, ref2 = _run_both(stack, steps=3, pnp_attn_t=0.0, pnp_f_t=0.0, pnp=True)
    assert not np.allclose(ref2, ref, atol=2e-3)
    np.testing.assert_allclose(out2, ref2, rtol=2e-3, atol=2e-3)


def test_composed_controlnet_edit_matches_reference_semantics(stack):
    """ControlNet-conditioned composition (cli/run_controlnet.py): the
    ControlNet runs on every 3-stream pass (pivotal AND propagation) with
    the per-frame conditioning image replicated per stream, residuals
    added to the UNet skips / mid output; extended attention + TokenFlow
    propagation active, PnP injection off (the conditioned editor's
    configuration)."""
    out, ref = _run_both(
        stack, steps=2, pnp_attn_t=0.0, pnp_f_t=0.0, pnp=False, cn=True
    )
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_composed_depth_edit_matches_reference_semantics():
    """Depth-conditioned composition (SD-2-depth family): per-frame depth
    map concatenated to the latent channels of every stream on BOTH the
    pivotal and propagation passes (reference run_tokenflow_pnp.py:63-64,
    200-201), with PnP injection active — the 5-channel UNet through the
    full composed loop."""
    import dataclasses

    cfg = dataclasses.replace(UNet2DConfig.tiny(), in_channels=5)
    sd = _build_unet_sd(cfg, seed=41)
    params = W.convert_unet_state_dict(
        {k: v.numpy().astype(np.float32) for k, v in sd.items()}
    )
    model = UNet2DConditionModel(cfg)

    def unet_apply(p, sample, t, ctx, edit, **kw):
        return model.apply(p, sample, t, ctx, edit=edit, **kw)

    rng = np.random.default_rng(42)
    x0 = rng.standard_normal((F_TOTAL, 4, HW, HW)) * 0.8
    embeds = rng.standard_normal((3, 7, cfg.cross_attention_dim)) * 0.5
    depth_stack = (cfg, sd, params, unet_apply, x0, embeds)
    out, ref = _run_both(
        depth_stack, steps=2, pnp_attn_t=0.5, pnp_f_t=0.8, pnp=True,
        depth=True,
    )
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def torch_vanilla_loop(sd, cfg, x0, unc_e, cond_e, timesteps, step_ratio,
                       bs, g):
    """The reference's uncalled per-frame SDEdit baseline, float64
    (run_tokenflow_sdedit.py:218-257): per batch a PLAIN UNet forward on
    ``torch.cat([batch] * 2)`` with stream-major [uncond*bs | cond*bs]
    embeds (repeat_interleave of text_embeds, :250), 2-stream CFG, then
    DDIMScheduler.step — no extended attention, no TokenFlow, no
    injection."""
    betas = (
        torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64)
        ** 2
    )
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    final_alpha = alphas_cumprod[0]
    x = x0.clone()
    text_embed = torch.cat([unc_e.repeat(bs, 1, 1), cond_e.repeat(bs, 1, 1)])
    for t in timesteps:
        t = int(t)
        new_x = []
        for b0 in range(0, len(x), bs):
            batch = x[b0 : b0 + bs]
            tb = torch.full((2 * len(batch),), t)
            pred = torch_unet(
                torch.cat([batch] * 2), tb, text_embed, sd, cfg
            )
            u, c = pred.chunk(2)
            eps = u + g * (c - u)
            a_t = alphas_cumprod[t]
            pt = t - step_ratio
            a_prev = alphas_cumprod[pt] if pt >= 0 else final_alpha
            x0_pred = (batch - (1 - a_t) ** 0.5 * eps) / a_t**0.5
            new_x.append(
                a_prev**0.5 * x0_pred + (1 - a_prev) ** 0.5 * eps
            )
        x = torch.cat(new_x)
    return x


def test_composed_vanilla_baseline_matches_reference_semantics(stack):
    """vanilla_sample_loop vs the float64 torch mirror of the reference's
    per-frame SDEdit baseline (run_tokenflow_sdedit.py:218-257) on the
    SDEdit-truncated schedule (start=0.9 on 5 steps keeps the last 3) —
    closes the last un-goldened loop family (VERDICT r03 weak #4)."""
    cfg, sd, params, unet_apply, x0, embeds = stack
    steps = 5
    sched = ddim.truncate_schedule(ddim.make_schedule(steps), 0.9)
    save_ts = ddim.make_schedule(steps).timesteps[::-1].copy()
    schedule = pipeline.make_edit_schedule(
        sched, save_ts, pnp_attn_t=0.0, pnp_f_t=0.0
    )

    out = pipeline.vanilla_sample_loop(
        unet_apply,
        {"params": params},
        jnp.asarray(x0.transpose(0, 2, 3, 1), jnp.float32),
        jnp.asarray(embeds[1:3], jnp.float32),  # [uncond | cond]
        schedule,
        guidance_scale=7.5,
        frame_chunk=WS,
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)

    e = torch.tensor(embeds, dtype=torch.float64)
    ref = torch_vanilla_loop(
        sd, cfg,
        torch.tensor(x0, dtype=torch.float64),
        e[1:2], e[2:3],
        sched.timesteps,
        1000 // steps,
        WS, 7.5,
    )
    np.testing.assert_allclose(out, ref.numpy(), rtol=2e-3, atol=2e-3)
    # the baseline really is TokenFlow-free: it must NOT match the full
    # edit loop on the same schedule/weights
    edit_out, _ = _run_both(
        stack, steps=5, pnp_attn_t=0.0, pnp_f_t=0.0, pnp=False, start=0.9
    )
    assert not np.allclose(out, edit_out, atol=2e-3)


def test_composed_sdedit_matches_reference_semantics(stack):
    """SDEdit composition: truncated schedule (the int() precedence quirk,
    run_tokenflow_sdedit.py:56-57 — start=0.9 on 5 steps keeps the LAST 3
    via int(1 - 4.5) = -3 -> timesteps[-3:], exercised through
    ddim.truncate_schedule), extended attention with NO injection."""
    out, ref = _run_both(
        stack, steps=5, pnp_attn_t=0.0, pnp_f_t=0.0, pnp=False, start=0.9
    )
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
