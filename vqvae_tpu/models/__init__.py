from vqvae_tpu.models.residual import ResidualLayer, ResidualStack
from vqvae_tpu.models.encoder import Encoder
from vqvae_tpu.models.decoder import Decoder
from vqvae_tpu.models.vqvae import VQVAE
from vqvae_tpu.models.pixelcnn import GatedPixelCNN

__all__ = [
    "ResidualLayer",
    "ResidualStack",
    "Encoder",
    "Decoder",
    "VQVAE",
    "GatedPixelCNN",
]
