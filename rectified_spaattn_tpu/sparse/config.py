"""Configuration for the rectified block-sparse attention pipeline."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SparseConfig:
    """Static (trace-time) description of one sparse-attention site.

    Mirrors the knobs of the reference per-model processors
    (reference: rectified_spaattn/rectified_hunyuan_attn.py:419-427,
    rectified_wan21_attn.py:389-397) but centralised, per SURVEY §5's
    config-consolidation note.

    Attributes:
      block_m / block_n: query / key block sizes (128 matches the MXU tile).
      p_remain: top-p cumulative-probability threshold for block selection
        (reference CLI --p_remain_rates, default 0.3).
      top_k_floor: minimum number of blocks kept per (head, q-block) —
        ``select_block_num = (1 - sa_drop_rate) * num_visual_blocks``.
      layout: "joint"  = text tokens appended after visual tokens; visual
                          queries sparse, text queries dense, IPAR active
                          (Hunyuan / Flux / CogVideoX);
              "visual" = self-attention over visual tokens only, text in a
                          separate cross-attention (Wan 2.1 / 2.2).
      text_len: padded length of the text tail (joint layout only).
      first_frame_blocks: number of leading curve blocks force-included for
        every query in that range (Wan first-frame retention,
        reference: rectified_wan21_attn.py:270-271).
    """

    top_k_floor: int
    p_remain: float = 0.3
    block_m: int = 128
    block_n: int = 128
    layout: str = "joint"
    text_len: int = 0
    first_frame_blocks: int = 0
    # Execute ``group_rows`` query blocks per kernel program over the UNION
    # of their key sets (kernels/block_sparse.py::
    # block_sparse_flash_attention_grouped).  Wins when adjacent curve
    # blocks select overlapping keys (real model data: smooth pooled
    # attention + shared neighborhoods + forced text columns) because the
    # kernel is HBM-bound; 1 disables grouping.
    group_rows: int = 1
    # KV blocks per online-softmax chunk inside the kernel (VMEM budget:
    # the fp32 score tile is group_rows*128 x chunk_blocks*128).  0 picks
    # a VMEM-safe default per group size.
    chunk_blocks: int = 0
    # KV gather precision.  Both int8 modes halve the byte-bound kernel's
    # HBM traffic via per-(head, 128-block) absmax quantization
    # (sparse/ops.py::quantize_kv_blocks); scores see ~0.4%/sqrt(D) noise.
    #   "int8": per-chunk convert to bf16 before the MXU — the convert
    #     forces a VMEM sublane relayout that costs more than the bytes
    #     saved on v5e (1124 ms vs 507 ms at the Hunyuan point,
    #     RESULTS_r2.md); kept as a tested opt-in for parts where the
    #     convert is free.
    #   "mxu8": int8 feeds the MXU directly (int8 x int8 -> int32 dots,
    #     q and p quantized in-kernel, scales folded into fp32 tiles) —
    #     no relayout; the round-3 fast path for the byte-bound regime.
    kv_quant: str = "none"
    # Build the plan in row tiles of this many query blocks (0 = one
    # shot).  Every plan stage is row-separable, so tiling only bounds
    # the fp32 [B,H,rows,NK] temporaries — the long-context memory
    # enabler (at 345k tokens the one-shot temps alone need ~3 GB;
    # chunk 256 bounds them to ~0.3 GB).  Serializes the build over
    # NQ/chunk tiles; keep 0 for normal video scales.
    plan_row_chunk: int = 0
    # Compute the plan's per-key-block column statistics (pooled K/V,
    # GAPR deviations) in tiles of this many key blocks (0 = one shot).
    # Bounds the fp32 block-view temporaries the same way plan_row_chunk
    # bounds the row side — at 345k tokens the one-shot fp32 converts of
    # full-length K/V were the OOM dump's three largest allocations.
    plan_kv_tile: int = 0
    # Pack K|V into one [B,H,S,2D] stream at the top of the attention
    # call (attention/rectified.py): XLA fuses the producers into the
    # packed buffer, the separate k/v buffers DCE, and the kernel gathers
    # from the stream instead of materialising its OWN packed copy — at
    # video scale that copy is ~1.5 GB (Wan 75.6k tokens), at 400k+ it is
    # ~5 GB.  Requires a block-aligned visual region (the pipelines pad
    # the token stream at the embed seam) and excludes kv_quant (which
    # carries its own packed payload).
    kv_pack: bool = False
    # Run the attention site in tiles of this many heads (0 = all heads
    # in one pass).  Every stage — plan build, kernel, rectification,
    # text rows — is head-separable, so head tiling divides ALL
    # attention-path temporaries (q/kv/out copies, fp32 plan and
    # rectify temps) by H/head_chunk at zero numerics cost; the peak-HBM
    # lever that fits the 16.4B Wan2.1-I2V tree at full depth next to
    # 75.6k-token activations.  Serializes tiles inside one jit (a
    # fori_loop); must divide the head count.
    head_chunk: int = 0
    # top-p/top-k selection implementation: "bisect" replaces the plan
    # build's dominant [B,H,NQ,NK] value sort with threshold bisection
    # (same kept set up to sub-float-resolution near-ties); "sort" is the
    # round-1 implementation kept as an oracle.
    topp_impl: str = "bisect"

    def __post_init__(self):
        if self.layout not in ("joint", "visual"):
            raise ValueError(f"layout must be 'joint' or 'visual', got {self.layout!r}")
        if self.layout == "joint" and self.text_len % self.block_n != 0:
            raise ValueError("text_len must be padded to a multiple of block_n")
        if self.block_m != self.block_n:
            raise ValueError("block_m != block_n is not supported")
        if not 1 <= self.group_rows <= 8:
            raise ValueError("group_rows must be in [1, 8] (membership "
                             "bits pack into the union sort key)")
        if self.kv_quant not in ("none", "int8", "mxu8"):
            raise ValueError(
                f"kv_quant must be none|int8|mxu8, got {self.kv_quant!r}")
        if self.kv_quant != "none" and self.group_rows > 1:
            raise ValueError("kv_quant is not implemented for grouped rows")
        if self.kv_pack and self.kv_quant != "none":
            raise ValueError("kv_pack does not compose with kv_quant "
                             "(the quantized path carries its own packed "
                             "payload and pools from raw k/v)")
        if self.head_chunk < 0:
            raise ValueError("head_chunk must be >= 0")

    @property
    def kernel_chunk_blocks(self) -> int:
        if self.chunk_blocks:
            return self.chunk_blocks
        # measured (RESULTS_r3.md chunk sweep at the Hunyuan point):
        # 24 best single-row (497 ms vs 508 at 16, 558 at 8, 508 at 32);
        # grouped rows keep 16 — the fp32 score tile
        # (group*128 x chunk*128 x 4B) caps VMEM
        if self.group_rows == 1:
            return 24
        return 16 if self.group_rows <= 4 else max(2, 64 // self.group_rows)

    @property
    def text_blocks(self) -> int:
        return self.text_len // self.block_n


def select_block_num(sa_drop_rate: float, num_visual_blocks: int) -> int:
    """Floor on kept blocks from a drop rate
    (reference: scripts/main_hunyuan.py:249-254)."""
    return int((1.0 - sa_drop_rate) * num_visual_blocks)
