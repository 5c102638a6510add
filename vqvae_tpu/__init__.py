"""vqvae_tpu — a TPU-native VQ-VAE engine built from scratch in JAX/XLA/Pallas.

Capability surface mirrors the MishaLaskin/vqvae reference (surveyed in SURVEY.md):
VQ-VAE training, the vector-quantization bottleneck (fused Pallas kernel on TPU),
latent extraction, a class-conditional GatedPixelCNN prior, autoregressive sampling,
checkpointing and metric logging — re-designed TPU-first (NHWC layouts, jit/NamedSharding
over a device mesh, functional weight masking, scan-based AR decode).
"""

from vqvae_tpu.config import (
    VQVAEConfig,
    PixelCNNConfig,
    TrainConfig,
    MeshConfig,
)

__version__ = "0.1.0"

__all__ = [
    "VQVAEConfig",
    "PixelCNNConfig",
    "TrainConfig",
    "MeshConfig",
    "__version__",
]
