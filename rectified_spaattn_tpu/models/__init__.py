from .hunyuan import HunyuanVideoConfig, HunyuanVideoDiT
from .wan import WanConfig, WanDiT
from .flux import FluxConfig, FluxDiT
from .cogvideox import CogVideoXConfig, CogVideoXDiT
from . import layers

__all__ = [
    "HunyuanVideoConfig", "HunyuanVideoDiT",
    "WanConfig", "WanDiT",
    "FluxConfig", "FluxDiT",
    "CogVideoXConfig", "CogVideoXDiT",
    "layers",
]
