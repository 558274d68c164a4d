"""Weight-only quantization for TPU serving (int8 / packed int4).

The reference serves every model in bf16 (scripts/main_hunyuan.py:233
`torch_dtype=torch.bfloat16`) on 80 GB GPUs; a 13 GB flagship does not fit
a 16 GB v5e next to video-scale activations.  Weight-only quantization is
the TPU-native answer: HBM capacity AND bandwidth are the binding
resources, and the MXU consumes bf16 natively, so we store kernels in
int8/int4 and dequantize at the matmul seam:

  int8 — per-output-channel scales.  int8 values are EXACT in bf16, so the
         dot runs on the MXU in the activation dtype and the fp32 scale is
         applied to the fp32 accumulator: the only rounding anywhere is the
         one int8 weight rounding (same property the gather kernel's int8
         KV path exploits, kernels/block_sparse.py).
  int4 — two nibbles per byte (offset-binary), per-(input-)group fp32
         scales; dequantized to a transient bf16 tile right before the dot
         (the tile is one kernel, ~75 MB peak — nothing at model scale).

``QDense`` is a drop-in for ``nn.Dense``: at init it produces exactly
nn.Dense's param tree ({kernel, bias}), so every checkpoint converter in
models/weights.py is unaffected; at apply time it dispatches on the params
actually bound.  ``quantize_params`` is the host-side tree transform that
rewrites a float tree into the quantized layout (it also handles stacked
[L, in, out] kernels produced by ``stack_block_params`` for the scan
execution mode).
"""

from __future__ import annotations

from collections.abc import Mapping

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from flax.linen.dtypes import promote_dtype


class QDense(nn.Module):
    """``nn.Dense`` drop-in that can consume weight-only-quantized kernels.

    Param-tree dispatch at apply time:

      kernel [in, out]                    — dense path (identical math /
                                            init tree to nn.Dense)
      kernel_q int8 [in, out]
        + kernel_scale f32 [out]          — int8 weights, scale applied to
                                            the fp32 accumulator
      kernel_q4 uint8 [in//2, out]
        + kernel_scale f32 [groups, out]  — packed int4, per-input-group
                                            scales, transient bf16 tile
    """
    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        contract = (((x.ndim - 1,), (0,)), ((), ()))
        if self.has_variable("params", "kernel_q"):
            q = self.get_variable("params", "kernel_q")
            scale = self.get_variable("params", "kernel_scale")
            y = jax.lax.dot_general(x, q.astype(x.dtype), contract,
                                    preferred_element_type=jnp.float32)
            y = (y * scale).astype(x.dtype)
        elif self.has_variable("params", "kernel_q4"):
            packed = self.get_variable("params", "kernel_q4")
            scale = self.get_variable("params", "kernel_scale")
            w = unpack_int4(packed, scale, x.dtype)
            y = jax.lax.dot_general(x, w, contract,
                                    preferred_element_type=jnp.float32
                                    ).astype(x.dtype)
        else:
            kernel = self.param("kernel", self.kernel_init,
                                (x.shape[-1], self.features))
            xk, kernel = promote_dtype(x, kernel, dtype=None)
            y = jax.lax.dot_general(xk, kernel, contract)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def unpack_int4(packed: jax.Array, scale: jax.Array,
                dtype=jnp.bfloat16) -> jax.Array:
    """[in//2, out] offset-binary nibbles + [G, out] scales -> [in, out]."""
    lo = (packed & 0xF).astype(jnp.int32) - 8
    hi = (packed >> 4).astype(jnp.int32) - 8
    q = jnp.stack([lo, hi], axis=1).reshape(packed.shape[0] * 2,
                                            packed.shape[1])
    groups = scale.shape[0]
    gs = q.shape[0] // groups
    w = q.reshape(groups, gs, -1).astype(jnp.float32) * scale[:, None, :]
    return w.reshape(q.shape[0], -1).astype(dtype)


def _quantize_kernel(w, bits: int, group_size: int) -> dict:
    """Quantize one [.., in, out] kernel (leading dims = stacked layers)."""
    w = np.asarray(w, dtype=np.float32)
    if bits == 8:
        scale = np.maximum(np.max(np.abs(w), axis=-2, keepdims=True),
                           1e-12) / 127.0
        q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
        return {"kernel_q": q,
                "kernel_scale": np.squeeze(scale, -2).astype(np.float32)}
    if bits != 4:
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    *lead, din, dout = w.shape
    g = min(group_size, din)
    if din % g or din % 2:
        raise ValueError(f"in-dim {din} not divisible by group {g} / 2")
    wg = w.reshape(*lead, din // g, g, dout)
    scale = np.maximum(np.max(np.abs(wg), axis=-2), 1e-12) / 7.0
    q = np.clip(np.rint(wg / scale[..., None, :]), -8, 7).astype(np.int32)
    q = (q + 8).reshape(*lead, din, dout)
    packed = (q[..., 0::2, :] | (q[..., 1::2, :] << 4)).astype(np.uint8)
    return {"kernel_q4": packed, "kernel_scale": scale.astype(np.float32)}


def dequantize_kernel(node: Mapping) -> np.ndarray:
    """Reconstruct the float kernel a quantized node represents (tests /
    debugging; the serving path never materializes this at model scale)."""
    if "kernel_q" in node:
        q = np.asarray(node["kernel_q"], np.float32)
        return q * np.asarray(node["kernel_scale"], np.float32)[..., None, :]
    packed = np.asarray(node["kernel_q4"])
    lo = (packed & 0xF).astype(np.int32) - 8
    hi = (packed >> 4).astype(np.int32) - 8
    q = np.stack([lo, hi], axis=-2).reshape(
        *packed.shape[:-2], packed.shape[-2] * 2, packed.shape[-1])
    scale = np.asarray(node["kernel_scale"], np.float32)
    *lead, din, dout = q.shape
    groups = scale.shape[-2]
    w = (q.reshape(*lead, groups, din // groups, dout).astype(np.float32)
         * scale[..., None, :])
    return w.reshape(*lead, din, dout)


def quantize_params(params, bits: int = 8, group_size: int = 128,
                    min_size: int = 1 << 20, skip: tuple = ()):
    """Rewrite every large QDense ``kernel`` in a param tree to the
    quantized layout.  Host-side (numpy) so a 13B tree never holds two
    device copies; pass the host tree BEFORE jnp.asarray-ing it.

    min_size: kernels below this element count stay float (embedders,
    heads, tiny test configs — quantize those explicitly by lowering it).
    skip: path substrings to leave dense (e.g. ("norm_out",)).
    """
    def walk(tree, path):
        if not isinstance(tree, Mapping):
            return tree
        k = tree.get("kernel")
        if (k is not None and hasattr(k, "ndim") and k.ndim >= 2
                and k.size >= min_size and k.shape[-2] % 2 == 0
                and not any(s in path for s in skip)):
            out = dict(_quantize_kernel(k, bits, group_size))
            out.update({n: v for n, v in tree.items() if n != "kernel"})
            return out
        return {n: walk(v, f"{path}/{n}") for n, v in tree.items()}
    return walk(params, "")


def quantized_nbytes(params) -> int:
    """Total bytes of a (possibly quantized) param tree."""
    return sum(np.asarray(l).nbytes if not isinstance(l, jax.Array)
               else l.nbytes for l in jax.tree_util.tree_leaves(params))
