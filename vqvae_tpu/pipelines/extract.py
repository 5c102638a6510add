"""Latent extraction: dataset -> code-index grids -> LATENT_BLOCK .npy.

The reference only *describes* this step (README.md:53-58: run the encoder +
``vector_quantization``, np.save ``min_encoding_indices`` to
``data/latent_e_indices.npy``) and ships no script for it; here it is a
first-class pipeline. Batches stream through a jitted encode+quantize forward
sharded over the data mesh; indices come back as int32 grids (N, h, w) and are
saved flat (N, h*w) — the layout LatentBlockDataset consumes
(reference utils.py:48-58, datasets/block.py:35-56).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.train.vqvae_train import TrainState, VQVAETrainer


def extract_latents(
    trainer: VQVAETrainer,
    state: TrainState,
    data: np.ndarray,
    batch_size: int = 256,
    out_path: Optional[str] = None,
) -> np.ndarray:
    """Encode ``data`` (N, 32, 32, 3) -> code indices (N, h*w) int32; optionally np.save."""
    model = trainer.model

    @jax.jit
    def codes_fn(params, x):
        return model.apply({"params": params}, x, method=model.codes)

    # Params may arrive as host numpy (e.g. fresh from a checkpoint); place
    # them once instead of re-transferring on every batch call.
    params = jax.device_put(state.params)

    n = len(data)
    out = []
    # Pad the tail batch to keep a single compiled shape (static shapes for XLA).
    for start in range(0, n, batch_size):
        chunk = data[start : start + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
        idx = np.asarray(codes_fn(params, jnp.asarray(chunk)))
        if pad:
            idx = idx[:-pad]
        out.append(idx.reshape(len(idx), -1))
    result = np.concatenate(out).astype(np.int32)

    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        np.save(out_path, result)
    return result


__all__ = ["extract_latents"]
