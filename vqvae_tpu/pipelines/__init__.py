from vqvae_tpu.pipelines.extract import extract_latents
from vqvae_tpu.pipelines.sample import sample_images

__all__ = ["extract_latents", "sample_images"]
