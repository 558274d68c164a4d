from .schedulers import (
    FlowMatchEulerScheduler, UniPCScheduler, CogVideoXDDIMScheduler,
    dynamic_cfg_scale, flux_mu_shift)
from .base import SparseSite, build_site, pad_tokens, classifier_free_guidance
from .hunyuan import HunyuanVideoPipeline
from .wan import WanPipeline, Wan22A14BPipeline
from .flux import FluxPipeline, FluxUpscalePipeline
from .cogvideox import CogVideoXPipeline

__all__ = [
    "FlowMatchEulerScheduler", "UniPCScheduler", "CogVideoXDDIMScheduler",
    "dynamic_cfg_scale", "flux_mu_shift",
    "SparseSite", "build_site", "pad_tokens", "classifier_free_guidance",
    "HunyuanVideoPipeline", "WanPipeline", "Wan22A14BPipeline",
    "FluxPipeline", "FluxUpscalePipeline", "CogVideoXPipeline",
]
