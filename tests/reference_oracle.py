"""Import the reference's ACTUAL torch mask-builder code as a test oracle.

VERDICT r2 item 2: the hand transliteration in test_mask_parity.py cannot
catch a transliteration bug of its own.  The reference's plan builders
(`_build_block_index_with_importance_optimized` in each
rectified_*_attn.py) and `estimate_pr_gain` are pure torch — runnable on
CPU — but their modules also import GPU-only deps (triton) and diffusers
at module scope.  This helper installs inert stubs for those, puts
/root/reference (read-only) on sys.path, and imports the real modules so
tests assert our plans bit-identical against the reference's OWN code,
not a copy of it.

Nothing here is shipped; the reference code is used strictly as the
object under comparison (reference: rectified_hunyuan_attn.py:171-280,
rectified_wan21_attn.py:171-273, rectified_cogvideo_attn.py:171-279,
rectified_flux_attn.py:170-279, gapr_mask.py:4-42).
"""

from __future__ import annotations

import functools
import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference"


class _AttrSink:
    """Returns itself for any attribute/call — enough for ``tl.*`` names
    used in triton kernel signatures and decorator arguments."""

    def __getattr__(self, name):
        return self

    def __call__(self, *args, **kwargs):
        return self

    def __getitem__(self, item):
        return self


def _install_stubs():
    # torch._dynamo -> inductor probes `triton.backends` if a `triton`
    # module is importable; import it BEFORE the stub exists so the probe
    # sees no triton at all.
    import torch._dynamo  # noqa: F401

    if "triton" not in sys.modules:
        t = types.ModuleType("triton")
        tl = types.ModuleType("triton.language")
        sink = _AttrSink()
        tl.constexpr = sink

        def _tl_getattr(name, _sink=sink):
            # dunders must raise: inspect/getmodule walk sys.modules and
            # read __file__/__path__ of every entry
            if name.startswith("__"):
                raise AttributeError(name)
            return _sink

        tl.__getattr__ = _tl_getattr
        t.language = tl
        # @triton.jit may be used bare or with arguments; the decorated
        # kernel body is never executed on CPU.
        t.jit = lambda f=None, **kw: f if callable(f) else (lambda g: g)
        t.autotune = lambda *a, **k: (lambda f: f)
        t.Config = sink
        t.cdiv = lambda a, b: (a + b - 1) // b
        sys.modules["triton"] = t
        sys.modules["triton.language"] = tl
    try:
        import diffusers  # noqa: F401  (real one, if present)
    except ImportError:
        d = types.ModuleType("diffusers")
        dm = types.ModuleType("diffusers.models")
        dap = types.ModuleType("diffusers.models.attention_processor")

        class Attention:  # signature-compat placeholder
            pass

        dap.Attention = Attention
        dm.attention_processor = dap
        d.models = dm
        sys.modules["diffusers"] = d
        sys.modules["diffusers.models"] = dm
        sys.modules["diffusers.models.attention_processor"] = dap


@functools.lru_cache(maxsize=None)
def load(module_name: str):
    """Import e.g. 'rectified_spaattn.rectified_hunyuan_attn' from the
    read-only reference checkout, with stubs installed."""
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(module_name)
