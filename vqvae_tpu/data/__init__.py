"""Data layer: in-memory datasets + samplers (reference utils.py, datasets/block.py).

TPU-first design: datasets are plain host numpy arrays (images already
normalized, NHWC) consumed by index-gather — either on host (``data[idx]``)
or staged once into device HBM and gathered on-device
(``VQVAETrainer.steps_by_index``). No worker processes, no per-sample
transform pipeline: the whole set fits in memory at these scales, so the
fastest loader is no loader.
"""

from vqvae_tpu.data.datasets import (
    ArrayDataset,
    load_block,
    load_cifar10,
    load_dataset,
    load_latent_block,
)
from vqvae_tpu.data.sampler import EpochSampler, ReplacementSampler

__all__ = [
    "ArrayDataset",
    "EpochSampler",
    "ReplacementSampler",
    "load_block",
    "load_cifar10",
    "load_dataset",
    "load_latent_block",
]
