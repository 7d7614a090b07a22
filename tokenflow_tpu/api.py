"""High-level python API (the CLIs wrap these; importable for notebooks
and programmatic use).

    from tokenflow_tpu import api

    api.invert(data_path="data/wolf", inversion_prompt="a wolf", ...)
    api.edit_pnp(config)      # dict with the reference's YAML keys
    api.edit_sdedit(config)
    api.edit_controlnet(config)
"""

from __future__ import annotations

from typing import Any


def invert(**kwargs) -> dict:
    """DDIM-invert a frame directory / video. kwargs mirror the preprocess
    CLI flags (data_path, inversion_prompt, steps, save_steps, n_frames,
    batch_size, sd_version, save_dir, model_dir, dtype, init, export_pt,
    H, W). Returns {save_path, timings, reconstruction_psnr}."""
    from tokenflow_tpu.cli.preprocess import build_parser, run

    parser = build_parser()
    opt = parser.parse_args([])
    for k, v in kwargs.items():
        if not hasattr(opt, k):
            raise TypeError(f"unknown preprocess option {k!r}")
        setattr(opt, k, v)
    return run(opt)


def _edit(config: dict[str, Any], runner, mode: str):
    from tokenflow_tpu.cli import common

    config = dict(config)
    common.validate_config(config, mode)
    import os

    os.makedirs(config["output_path"], exist_ok=True)
    common.dump_config(config)
    return runner(config)


def edit_pnp(config: dict[str, Any]):
    """TokenFlow-PnP edit. config uses the reference YAML keys; unlike the
    CLI, output_path is used as-is (no hyperparameter path encoding)."""
    from tokenflow_tpu.cli.run_pnp import edit_video

    return _edit(config, edit_video, "pnp")


def edit_sdedit(config: dict[str, Any], vanilla: bool = False):
    from tokenflow_tpu.cli.run_sdedit import edit_video

    return _edit(config, lambda c: edit_video(c, vanilla=vanilla), "sdedit")


def edit_controlnet(config: dict[str, Any]):
    from tokenflow_tpu.cli.run_controlnet import edit_video

    return _edit(config, edit_video, "controlnet")
