"""End-to-end sampling: AR PixelCNN draw -> codebook lookup -> Decoder images.

The reference's path is split between ``GatedPixelCNN.generate`` (one full
forward per pixel, eager python loop — pixelcnn/models.py:129-143) and the
notebook's ``generate_samples`` (one-hot @ codebook -> reshape -> decoder —
visualization.ipynb cell 13). Here it is one function: a jitted scan-based AR
draw of the code grid followed by codebook gather + decode, all on device.

Also provides the notebook's two diagnostic latent samplers (cells 10-12):
uniform-random codes and histogram-of-seen-codes sampling.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.train.pixelcnn_train import PixelCNNState, PixelCNNTrainer
from vqvae_tpu.train.vqvae_train import TrainState, VQVAETrainer


def decode_code_grids(
    trainer: VQVAETrainer, state: TrainState, indices: np.ndarray
) -> np.ndarray:
    """(B, h, w) int code grids -> (B, 32, 32, 3) images."""
    model = trainer.model

    @jax.jit
    def decode(params, idx):
        return model.apply({"params": params}, idx, method=model.decode_codes)

    return np.asarray(decode(state.params, jnp.asarray(indices, jnp.int32)))


def sample_images(
    vq_trainer: VQVAETrainer,
    vq_state: TrainState,
    prior_trainer: PixelCNNTrainer,
    prior_state: PixelCNNState,
    labels: np.ndarray,
    rng: Optional[jax.Array] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (images (B, 32, 32, 3), code grids (B, h, w))."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    codes = prior_trainer.generate(prior_state, labels, rng=rng)
    images = decode_code_grids(vq_trainer, vq_state, codes)
    return images, codes


def sample_uniform_codes(
    n_embeddings: int, batch: int, grid: Tuple[int, int], rng: jax.Array
) -> np.ndarray:
    """Uniform-random code grids (notebook cell 10 — the 'scrambled' oracle)."""
    return np.asarray(
        jax.random.randint(rng, (batch, *grid), 0, n_embeddings, dtype=jnp.int32)
    )


def sample_histogram_codes(
    seen_indices: np.ndarray, batch: int, grid: Tuple[int, int], rng: jax.Array
) -> np.ndarray:
    """Sample codes from the empirical histogram of seen codes (notebook cell 11-12)."""
    flat = np.asarray(seen_indices).reshape(-1)
    counts = np.bincount(flat, minlength=int(flat.max()) + 1).astype(np.float64)
    probs = counts / counts.sum()
    draws = jax.random.choice(
        rng,
        len(probs),
        shape=(batch, *grid),
        p=jnp.asarray(probs),
    )
    return np.asarray(draws, dtype=np.int32)


__all__ = [
    "decode_code_grids",
    "sample_images",
    "sample_uniform_codes",
    "sample_histogram_codes",
]
