from .hunyuan import HunyuanVideoConfig, HunyuanVideoDiT
from .wan import WanConfig, WanDiT
from .flux import FluxConfig, FluxDiT
from .cogvideox import CogVideoXConfig, CogVideoXDiT
from .vae import VAEConfig, VAEDecoder, VAEEncoder, tiled_decode
from .encoders import HashEncoder, TransformersTextEncoder, make_text_encoder
from . import layers, weights

__all__ = [
    "HunyuanVideoConfig", "HunyuanVideoDiT",
    "WanConfig", "WanDiT",
    "FluxConfig", "FluxDiT",
    "CogVideoXConfig", "CogVideoXDiT",
    "VAEConfig", "VAEDecoder", "VAEEncoder", "tiled_decode",
    "HashEncoder", "TransformersTextEncoder", "make_text_encoder",
    "layers", "weights",
]
