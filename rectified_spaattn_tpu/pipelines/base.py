"""Shared generation-pipeline machinery.

Each model pipeline composes the same pieces (mirroring the reference's
eight driver scripts, SURVEY §2.4, without their copy-paste):

  setup   — curve + neighbor-mask precompute, sparse params, jitted model
            stages (embed / blocks / head), scheduler, TeaCache
  loop    — host-side Python over denoise steps: ONE scalar readback per
            step for the TeaCache decision, everything else stays on
            device (SURVEY §7 "no .item() syncs in the step loop")
  timing  — denoise wall-clock with forced sync at loop start/end
            (reference probes: scripts/main_hunyuan.py:105-108,199-202)

The sparse/dense warm-up gates of the reference processors (per-layer ids,
per-step warm_steps) are expressed as TWO jitted block-stack variants —
a warm (dense) one and a sparse one — selected per step on the host.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import cached_curve
from ..sparse import SparseConfig, select_block_num
from ..attention import attention


@dataclasses.dataclass(frozen=True)
class SparseSite:
    """Everything one sparse attention site needs, precomputed."""
    cfg: SparseConfig
    neighbor_mask: jax.Array          # [NB, NB] bool
    visual_len: int                   # true visual tokens (pre-padding)

    def attn_fn(self, mode: str, text_len_rt=None, interpret: bool = False,
                mesh=None):
        site = self
        if mesh is not None and mode == "sparse":
            # multi-chip: heads sharded over the mesh's tp axis — the
            # sparse pipeline is per-head, so the whole path is
            # collective-free under head sharding (attention/sharded.py)
            from ..attention.sharded import head_parallel_rectified_attention

            def fn_sharded(q, k, v):
                return head_parallel_rectified_attention(
                    mesh, q, k, v, site.cfg, site.neighbor_mask,
                    visual_len=site.visual_len, text_len_rt=text_len_rt,
                    interpret=interpret)
            return fn_sharded

        def fn(q, k, v):
            return attention(
                q, k, v, mode=mode, cfg=site.cfg,
                neighbor_mask=site.neighbor_mask,
                visual_len=site.visual_len, text_len_rt=text_len_rt,
                interpret=interpret)
        return fn


def build_site(latent_t: int, latent_h: int, latent_w: int, *,
               sa_drop_rate: float, p_remain: float, layout: str,
               text_len: int = 0, block_size: int = 128,
               first_frame_retention: bool = False,
               curve_variant: str = "full",
               axis_order=("w", "h", "t"),
               plan_row_chunk: int = 0,
               plan_kv_tile: int = 0,
               group_rows: int = 1,
               kv_pack: bool = False,
               head_chunk: int = 0):
    """Curve + neighbor precompute and sparse config for one geometry
    (reference: build_multi_curve + sparse-param calc,
    scripts/main_hunyuan.py:23-42,249-254)."""
    l2h, h2l, neighbors = cached_curve(
        latent_t, latent_h, latent_w, block_size=block_size,
        axis_order=axis_order, variant=curve_variant)
    sv = latent_t * latent_h * latent_w
    img_blocks = sv // block_size
    floor = select_block_num(sa_drop_rate, img_blocks)
    ffb = 0
    if first_frame_retention:
        # one frame's worth of curve blocks (reference:
        # scripts/main_wan21t2v.py:259)
        ffb = img_blocks // latent_t
    nb_pad = -(-sv // block_size)
    if neighbors.shape[0] < nb_pad:   # pad-block rows (never selected)
        pad = nb_pad - neighbors.shape[0]
        neighbors = np.pad(neighbors, ((0, pad), (0, pad)))
    cfg = SparseConfig(
        top_k_floor=max(floor, 1), p_remain=p_remain, layout=layout,
        text_len=text_len, first_frame_blocks=ffb,
        block_m=block_size, block_n=block_size,
        plan_row_chunk=plan_row_chunk, plan_kv_tile=plan_kv_tile,
        group_rows=group_rows, kv_pack=kv_pack, head_chunk=head_chunk)
    site = SparseSite(cfg=cfg, neighbor_mask=jnp.asarray(neighbors),
                      visual_len=sv)
    return site, jnp.asarray(l2h), jnp.asarray(h2l)


def pad_tokens(x: jax.Array, multiple: int, axis: int = 1) -> jax.Array:
    """Zero-pad a token axis up to a multiple (the reference pads inside
    the attention call, rectified_wan21_attn.py:299-304; we pad once at
    the sequence level so every layer sees static shapes)."""
    s = x.shape[axis]
    pad = (-s) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def classifier_free_guidance(cond, uncond, scale):
    return uncond + scale * (cond - uncond)


def finalize_params(params, mesh):
    """Device-place a (possibly host/numpy) param tree exactly once.

    With a mesh: one device_put per leaf against the param_shardings plan
    (numpy leaves transfer straight to their sharded placement — no
    intermediate single-device copy of a multi-GB tree).  Without: a plain
    transfer, only if any leaf is still host-side — jitted calls would
    otherwise re-stream the full weight tree through the tunnel every
    step."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    if mesh is not None:
        from ..parallel import shard_params
        return shard_params(mesh, params)
    if any(isinstance(l, np.ndarray)
           for l in jax.tree_util.tree_leaves(params)):
        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params


def param_compute_dtype(params):
    """Activation dtype for a parameter tree: bf16 when the params are
    bf16 (real checkpoints), else fp32.  jnp promotion would otherwise
    run a bf16 model's video-scale activations in fp32 — 2x the HBM
    traffic and activation footprint of the reference's bf16 transformer
    (main_hunyuan.py:233)."""
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(params)
    bf16 = any(getattr(l, "dtype", None) == jnp.bfloat16 for l in leaves)
    return jnp.bfloat16 if bf16 else jnp.float32
