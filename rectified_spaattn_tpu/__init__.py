"""Rectified-SpaAttn TPU — a TPU-native (JAX/XLA/Pallas) framework for
training-free acceleration of diffusion-transformer inference via
rectified block-sparse attention.

Re-designed from scratch for TPU with the capabilities of the reference
CUDA/Triton implementation (BienLuky/Rectified-SpaAttn):

- Jenga/Gilbert 3-D space-filling-curve token reordering  (`curves/`)
- IPAR + GAPR + top-p/top-k dynamic block selection        (`sparse/`)
- Pallas block-sparse flash-attention kernel               (`kernels/`)
- Rectified sparse attention (joint / visual-only flavors) (`attention/`)
- JAX DiT backbones: Hunyuan, Wan2.1/2.2, CogVideoX, Flux  (`models/`)
- TeaCache step-residual caching                           (`cache/`)
- Samplers + generation pipelines                          (`pipelines/`)
- Device-mesh sharding (DP / head-TP / SP)                 (`parallel/`)
- Metric + batch-eval harness                              (`eval/`)
"""

__version__ = "0.1.0"
