"""Edit-context types: the functional replacement for the reference's
module-attribute hooks (tokenflow_utils.py:7-47 register_* setattr state).

All TokenFlow editing state flows through these pytrees as explicit UNet
arguments/returns — no monkey-patching, no side effects, fully jittable.

Streams convention: editing passes run the UNet on a flattened batch of
``3 * n_frames`` items laid out FRAME-MAJOR — item i = (frame i//3,
stream i%3), streams ordered [source, uncond, cond]. Per-(frame, stream)
math is identical to the reference's stream-major concat
(run_tokenflow_pnp.py:199); the frame-major flattening is chosen because a
frame-sharded batch axis then factors as (n_frames, 3) with no resharding,
whereas a stream-major (3, n_frames) view of a frame-sharded axis is not an
expressible HLO sharding and forces a full hidden-state all-gather at every
edit site (measured: scripts/inspect_sharded_hlo.py). The surgery ops keep
(3, n_frames, ...) stream-major VIEWS internally via cheap transposes.
"""

from __future__ import annotations

from typing import Optional

import jax
from flax import struct


class EditMode:
    NONE = "none"  # plain UNet (preprocess / vanilla sampling)
    PIVOTAL = "pivotal"  # keyframe pass: extended attn, fills the cache
    PROPAGATE = "propagate"  # propagation pass: NN-gather from the cache
    # single-pass fusion of the two: per stream the batch is
    # [K pivots | F frames]; at each block the pivot segment runs extended
    # attention producing the site cache, which the frame segment's NN
    # propagation consumes immediately. Math-identical to PIVOTAL followed
    # by PROPAGATE (the reference's two passes, run_tokenflow_pnp.py:226-232)
    # but one UNet traversal with a full-size batch.
    FUSED = "fused"


@struct.dataclass
class BlockEdit:
    """Per-self-attention-site edit directive for one UNet call.

    Static (non-pytree) fields select the traced program; dynamic fields are
    traced arrays so injection schedules stay inside one jit.
    """

    # -- static
    mode: str = struct.field(pytree_node=False, default=EditMode.NONE)
    n_frames: int = struct.field(pytree_node=False, default=1)
    n_pivots: int = struct.field(pytree_node=False, default=0)  # FUSED mode
    qk_inject_site: bool = struct.field(pytree_node=False, default=False)
    # streams in this pass's frame-major batch. 3 ([source|uncond|cond],
    # the reference layout) except the approximate propagation pass
    # (UNetEdit.prop_approx), which drops the source stream and runs
    # [uncond|cond]. Stream 0 of the batch always drives the NN matching.
    n_streams: int = struct.field(pytree_node=False, default=3)
    # PIVOTAL only: additionally cache the uncond-stream normed states
    # (the matching table of the approximate propagation pass)
    cache_uncond: bool = struct.field(pytree_node=False, default=False)
    # -- dynamic
    qk_gate: Optional[jax.Array] = None  # scalar bool: t in PnP qk schedule
    pivot_h: Optional[jax.Array] = None  # (K, S, D) cached matching states
    kf_attn: Optional[jax.Array] = None  # (n_streams, K, S, D) cached outs
    # propagation metadata (ops.propagation.propagation_indices), sliced to
    # this pass's frames so propagation can be chunked over frames:
    prop_pa: Optional[jax.Array] = None  # (F,) own-window pivot index
    prop_pb: Optional[jax.Array] = None  # (F,) previous-window pivot index
    prop_w1: Optional[jax.Array] = None  # (F,) blend weight of prop_pa


@struct.dataclass
class ConvEdit:
    """Edit directive for the PnP feature-injection resnet site
    (reference tokenflow_utils.py:49-104, installed on up_blocks[1].resnets[1]).

    Exact mode (``approx=False``): the uncond/cond streams of the 3-stream
    batch are overwritten with the source stream after conv2 — identical in
    pivotal and propagation passes. Approximate mode (UNetEdit.prop_approx):
    the PIVOTAL pass additionally caches the pivots' source conv2 features
    (returned as ``{"conv_src": (K, h, w, c)}``); the PROPAGATE pass runs
    source-free ([uncond|cond]) and injects the two-pivot distance blend of
    the cached pivot features instead (same pa/pb/w1 metadata as the token
    propagation sites) — a temporal approximation of the per-frame source
    features the exact pass computes."""

    # -- static
    mode: str = struct.field(pytree_node=False, default=EditMode.NONE)
    n_frames: int = struct.field(pytree_node=False, default=1)
    n_streams: int = struct.field(pytree_node=False, default=3)
    approx: bool = struct.field(pytree_node=False, default=False)
    # -- dynamic
    gate: Optional[jax.Array] = None  # scalar bool: t in PnP f schedule
    src_cache: Optional[jax.Array] = None  # (K, h, w, c) pivot source conv2
    prop_pa: Optional[jax.Array] = None  # (F,)
    prop_pb: Optional[jax.Array] = None  # (F,)
    prop_w1: Optional[jax.Array] = None  # (F,)


@struct.dataclass
class UNetEdit:
    """Whole-UNet edit directive; the UNet fans it out to sites.

    ``cache`` maps site name -> {"pivot_h": ..., "kf_attn": ...} and is
    consumed in PROPAGATE mode; PIVOTAL mode returns a new cache of the same
    structure (the explicit version of the reference's hook-cached
    pivot_hidden_states / kf_attn_output, tokenflow_utils.py:327,360).
    """

    mode: str = struct.field(pytree_node=False, default=EditMode.NONE)
    n_frames: int = struct.field(pytree_node=False, default=1)
    n_pivots: int = struct.field(pytree_node=False, default=0)
    pnp: bool = struct.field(pytree_node=False, default=False)
    # approximate propagation (opt-in, NON-PARITY fast mode): the
    # propagation pass drops the source stream — ~1/3 of its batch, which
    # exists solely to provide NN-matching features and the conv-injection
    # source (PERF.md known-overhead #3). Matching then runs on the uncond
    # stream against uncond pivot states cached by the pivotal pass
    # (``pivot_h_uncond``), and conv injection blends cached pivot source
    # features (see ConvEdit). PIVOTAL passes still run all 3 streams.
    prop_approx: bool = struct.field(pytree_node=False, default=False)
    qk_gate: Optional[jax.Array] = None
    conv_gate: Optional[jax.Array] = None
    cache: Optional[dict[str, dict[str, jax.Array]]] = None
    prop_pa: Optional[jax.Array] = None
    prop_pb: Optional[jax.Array] = None
    prop_w1: Optional[jax.Array] = None

    def for_site(self, site: str) -> BlockEdit:
        entry = (self.cache or {}).get(site)
        approx_prop = self.prop_approx and self.mode == EditMode.PROPAGATE
        # SDEdit approx is source-free EVERYWHERE: without PnP injection
        # no stream ever consumes the source, so even the pivotal pass
        # runs [uncond|cond] and its cache is born 2-stream, uncond-led.
        src_free_piv = (
            self.prop_approx
            and not self.pnp
            and self.mode == EditMode.PIVOTAL
        )
        if entry is None:
            pivot_h = kf_attn = None
        elif approx_prop and self.pnp:
            # 3-stream pivotal cache: match uncond-vs-uncond, gather only
            # the [uncond|cond] outputs
            pivot_h = entry["pivot_h_uncond"]
            kf_attn = entry["kf_attn"][1:]
        else:
            # exact cache, or the already-2-stream source-free cache
            pivot_h = entry["pivot_h"]
            kf_attn = entry["kf_attn"]
        return BlockEdit(
            mode=self.mode,
            n_frames=self.n_frames,
            n_pivots=self.n_pivots,
            qk_inject_site=self.pnp and site in QK_INJECT_SITES,
            n_streams=2 if (approx_prop or src_free_piv) else 3,
            cache_uncond=(
                self.prop_approx
                and self.pnp
                and self.mode == EditMode.PIVOTAL
            ),
            qk_gate=self.qk_gate,
            pivot_h=pivot_h,
            kf_attn=kf_attn,
            prop_pa=self.prop_pa,
            prop_pb=self.prop_pb,
            prop_w1=self.prop_w1,
        )

    def for_conv(self, site: str) -> Optional[ConvEdit]:
        if not self.pnp or site != CONV_INJECT_SITE:
            return None
        approx_prop = self.prop_approx and self.mode == EditMode.PROPAGATE
        entry = (self.cache or {}).get(site)
        # FUSED batches are [K pivots | F frames] per stream
        return ConvEdit(
            mode=self.mode,
            n_frames=self.n_frames + self.n_pivots,
            n_streams=2 if approx_prop else 3,
            approx=self.prop_approx,
            gate=self.conv_gate,
            src_cache=None if entry is None else entry["conv_src"],
            prop_pa=self.prop_pa,
            prop_pb=self.prop_pb,
            prop_w1=self.prop_w1,
        )


# PnP q/k injection runs on decoder attention blocks 4-11 only
# (reference tokenflow_utils.py:208-214 res_dict {1:[1,2], 2:[0,1,2], 3:[0,1,2]});
# all other self-attn sites get extended attention with no injection.
QK_INJECT_SITES = frozenset(
    {
        "up_1_1",
        "up_1_2",
        "up_2_0",
        "up_2_1",
        "up_2_2",
        "up_3_0",
        "up_3_1",
        "up_3_2",
    }
)

# PnP feature (conv) injection site: second resnet of the first cross-attn
# up block (reference tokenflow_utils.py:102 up_blocks[1].resnets[1]).
CONV_INJECT_SITE = "up_1_res_1"

# All 16 self-attention sites, in UNet traversal order.
SELF_ATTN_SITES = (
    "down_0_0",
    "down_0_1",
    "down_1_0",
    "down_1_1",
    "down_2_0",
    "down_2_1",
    "mid",
    "up_1_0",
    "up_1_1",
    "up_1_2",
    "up_2_0",
    "up_2_1",
    "up_2_2",
    "up_3_0",
    "up_3_1",
    "up_3_2",
)
