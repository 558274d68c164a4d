"""Scan-over-blocks execution: one traced block instead of N unrolled.

The reference never compiles its transformer (eager torch, graph rebuilt
every call); under XLA an unrolled 60-block HunyuanVideo program is ~60x
the HLO of one block, which at video scale means multi-hour remote
compiles and a scheduler free to overlap cross-block temporaries (see
models/hunyuan.py::run_blocks on why that OOMs).  ``lax.scan`` over
stacked per-block parameters compiles the block ONCE and serializes
iterations by construction — the TPU-idiomatic layout for deep uniform
stacks (and the standard trick from the scaling playbook).

Params for the scanned segment are stacked leaf-wise to [L, ...] by
``stack_block_params``; weight-only quantization (models/quant.py)
composes — quantize_params handles the stacked kernels, and lax.scan
slices the int8/int4 leaves per iteration.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (AdaLayerNormZero, AttnFn, CrossAttnBlock,
                     DualStreamBlock, SingleStreamBlock)


def stack_block_params(tree: dict, prefix: str, n: int):
    """Split ``{prefix}0..{prefix}{n-1}`` out of a params dict and stack
    them leaf-wise to [n, ...].  Returns (rest, stacked).  Stacking stays
    in the leaves' own memory space (numpy in, numpy out) so a 13B host
    tree never doubles on device."""
    names = [f"{prefix}{i}" for i in range(n)]
    missing = [m for m in names if m not in tree]
    if missing:
        raise KeyError(f"blocks missing from params: {missing[:3]}...")
    subs = [tree[m] for m in names]
    rest = {k: v for k, v in tree.items() if k not in set(names)}
    is_np = isinstance(jax.tree_util.tree_leaves(subs[0])[0], np.ndarray)
    stack = (lambda *xs: np.stack(xs)) if is_np else (lambda *xs: jnp.stack(xs))
    return rest, jax.tree_util.tree_map(stack, *subs)


def unstack_block_params(stacked: dict, prefix: str) -> dict:
    """Inverse of stack_block_params (tests / checkpoint export)."""
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return {f"{prefix}{i}": jax.tree_util.tree_map(lambda a: a[i], stacked)
            for i in range(n)}


def hunyuan_run_blocks_scan(cfg, dual_stack: dict, single_stack: dict,
                            x, ctx, temb, rope, attn_fn: AttnFn,
                            temb_alt=None, alt_mask=None):
    """Functional equivalent of HunyuanVideoDiT.run_blocks over stacked
    params (reference hot loop: scripts/main_hunyuan.py:134-157).  No
    optimization_barrier needed — scan serializes iterations itself, so
    only one block's temporaries are ever live."""
    mc = getattr(cfg, "mlp_chunk", 1)
    dual = DualStreamBlock(cfg.hidden_dim, cfg.heads, cfg.mlp_mult,
                           mlp_chunk=mc)
    single = SingleStreamBlock(cfg.hidden_dim, cfg.heads, cfg.mlp_mult,
                               mlp_chunk=mc)

    def dual_body(carry, p):
        cx, cc = carry
        return dual.apply({"params": p}, cx, cc, temb, rope, attn_fn,
                          temb_alt, alt_mask), None

    def single_body(carry, p):
        cx, cc = carry
        return single.apply({"params": p}, cx, cc, temb, rope, attn_fn,
                            temb_alt, alt_mask), None

    if cfg.num_dual_blocks:
        (x, ctx), _ = jax.lax.scan(dual_body, (x, ctx), dual_stack)
    if cfg.num_single_blocks:
        (x, ctx), _ = jax.lax.scan(single_body, (x, ctx), single_stack)
    return x, ctx


def hunyuan_run_phase_scan(cfg, stack: dict, phase: str, x, ctx, temb,
                           rope, attn_fn: AttnFn, win_start, win_size: int,
                           temb_alt=None, alt_mask=None):
    """A WINDOW of one Hunyuan phase over the full stacked tree — the
    dispatch-window building block (pipelines/hunyuan.py
    dispatch_segments): environments with a per-dispatch execution
    watchdog (the axon tunnel kills single dispatches past ~60 s) run the
    full-depth model as several shorter dispatches.

    Implemented as a fori_loop indexing ONE block's params per iteration
    (what lax.scan does internally) — slicing the window out of the
    stacked tree up front would materialise half a 13B weight tree as a
    copy (measured RESOURCE_EXHAUSTED at full depth)."""
    mc = getattr(cfg, "mlp_chunk", 1)
    blk = (DualStreamBlock(cfg.hidden_dim, cfg.heads, cfg.mlp_mult,
                           mlp_chunk=mc)
           if phase == "dual" else
           SingleStreamBlock(cfg.hidden_dim, cfg.heads, cfg.mlp_mult,
                             mlp_chunk=mc))

    def body(i, carry):
        cx, cc = carry
        p = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, 0,
                                                   keepdims=False), stack)
        return blk.apply({"params": p}, cx, cc, temb, rope, attn_fn,
                         temb_alt, alt_mask)

    return jax.lax.fori_loop(win_start, win_start + win_size, body,
                             (x, ctx))


def wan_run_blocks_scan(cfg, stack: dict, x, ctx, ctx_img, temb6, rope,
                        segments, cross_attn_fn: AttnFn):
    """Functional equivalent of WanDiT.run_blocks over stacked params.

    ``segments``: [(start, end, self_attn_fn), ...] covering [0, n) in
    order — the reference's per-layer warm gates (dense head/tail layers,
    sparse middle; rectified_wan21_attn.py:467, rectified_wan22_attn.py:246)
    become one scan per contiguous segment, so the block still compiles
    once per DISTINCT attention fn instead of once per layer."""
    blk = CrossAttnBlock(cfg.hidden_dim, cfg.heads,
                         cfg.ffn_dim / cfg.hidden_dim,
                         image_cross=cfg.image_cross,
                         mlp_chunk=getattr(cfg, "mlp_chunk", 1))
    for start, end, fn in segments:
        if start >= end:
            continue
        sub = jax.tree_util.tree_map(lambda a: a[start:end], stack)

        def body(carry, p, fn=fn):
            return blk.apply({"params": p}, carry, ctx, temb6, rope, fn,
                             cross_attn_fn, ctx_img=ctx_img), None

        x, _ = jax.lax.scan(body, x, sub)
    return x


def wan_run_window_scan(cfg, stack: dict, x, ctx, ctx_img, temb6, rope,
                        attn_fn: AttnFn, cross_attn_fn: AttnFn,
                        win_start, win_size: int):
    """A WINDOW of the Wan stack over the full stacked tree — the
    dispatch-window building block (pipelines/wan.py dispatch_segments;
    see hunyuan_run_phase_scan for the watchdog rationale).  fori_loop
    indexes ONE block's params per iteration so no stacked-tree slice is
    ever materialised."""
    blk = CrossAttnBlock(cfg.hidden_dim, cfg.heads,
                         cfg.ffn_dim / cfg.hidden_dim,
                         image_cross=cfg.image_cross,
                         mlp_chunk=getattr(cfg, "mlp_chunk", 1))

    def body(i, cx):
        p = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, 0,
                                                   keepdims=False), stack)
        return blk.apply({"params": p}, cx, ctx, temb6, rope, attn_fn,
                         cross_attn_fn, ctx_img=ctx_img)

    return jax.lax.fori_loop(win_start, win_start + win_size, body, x)


def flux_run_blocks_scan(cfg, dual_stack: dict, single_stack: dict,
                         x, ctx, temb, rope, dual_segments,
                         single_segments, cn_dual=None, cn_single=None):
    """Functional equivalent of FluxDiT.run_blocks over stacked params.

    ``*_segments``: [(start, end, attn_fn), ...] covering the stack — the
    reference's sparse layer gate (fused id < 37 or >= 57 sparse,
    rectified_flux_attn.py:493) becomes one scan per contiguous segment.

    ``cn_dual`` / ``cn_single``: the RAW ControlNet sample lists (NOT
    interval-expanded) — each iteration dynamically indexes sample
    min(i // ceil(L/N), N-1) (reference main_upflux.py:163-172), so HBM
    holds N samples instead of the L duplicates a stacked expansion
    would materialize."""
    import math
    mc = getattr(cfg, "mlp_chunk", 1)
    dual = DualStreamBlock(cfg.hidden_dim, cfg.heads, cfg.mlp_mult,
                           mlp_chunk=mc)
    single = SingleStreamBlock(cfg.hidden_dim, cfg.heads, cfg.mlp_mult,
                               mlp_chunk=mc)

    def run(blk, stack, segments, cn, n_blocks, carry):
        samples = jnp.stack(cn) if cn else None        # [N, B, S, H]
        interval = math.ceil(n_blocks / samples.shape[0]) if cn else 1
        for start, end, fn in segments:
            if start >= end:
                continue
            sub = jax.tree_util.tree_map(lambda a: a[start:end], stack)
            idx = jnp.asarray(
                [min(i // interval, (len(cn) if cn else 1) - 1)
                 for i in range(start, end)], jnp.int32)

            def body(c, s, fn=fn, use_cn=samples is not None):
                p, j = s
                cx, cc = blk.apply({"params": p}, c[0], c[1], temb, rope,
                                   fn)
                if use_cn:
                    cx = cx + samples[j]
                return (cx, cc), None

            carry, _ = jax.lax.scan(body, carry, (sub, idx))
        return carry

    if cfg.num_dual_blocks:
        x, ctx = run(dual, dual_stack, dual_segments, cn_dual,
                     cfg.num_dual_blocks, (x, ctx))
    if cfg.num_single_blocks:
        x, ctx = run(single, single_stack, single_segments, cn_single,
                     cfg.num_single_blocks, (x, ctx))
    return x, ctx


def cog_run_blocks_scan(cfg, stack: dict, x, ctx, temb, rope,
                        attn_fn: AttnFn):
    """Functional equivalent of CogVideoXDiT.run_blocks over stacked
    params (Cog gates sparsity by CALL, not layer —
    rectified_cogvideo_attn.py warm_calls — so one scan covers the whole
    stack)."""
    from .cogvideox import CogVideoXBlock
    blk = CogVideoXBlock(cfg.hidden_dim, cfg.heads, cfg.mlp_mult)

    def body(carry, p):
        return blk.apply({"params": p}, carry[0], carry[1], temb, rope,
                         attn_fn), None

    (x, ctx), _ = jax.lax.scan(body, (x, ctx), stack)
    return x, ctx


def gate_segments(n: int, fn_of_index) -> list:
    """Collapse a per-layer attn-fn assignment into contiguous
    (start, end, fn) segments (fewer distinct scans == fewer traced block
    programs)."""
    segs = []
    for i in range(n):
        fn = fn_of_index(i)
        if segs and segs[-1][2] is fn:
            segs[-1] = (segs[-1][0], i + 1, fn)
        else:
            segs.append((i, i + 1, fn))
    return segs


def hunyuan_teacache_signal_scan(cfg, dual_stack: dict, x, temb):
    """Block-0 norm1 modulated input from the stacked tree (the unrolled
    path's HunyuanVideoDiT.teacache_signal; reference
    scripts/main_hunyuan.py:113)."""
    if not cfg.num_dual_blocks:
        return x + temb[:, None]
    p0 = jax.tree_util.tree_map(lambda a: a[0], dual_stack["norm1"])
    return AdaLayerNormZero(cfg.hidden_dim).apply({"params": p0}, x, temb)[0]
