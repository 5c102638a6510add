"""Evaluation & visualization pipeline (the reference's visualization.ipynb as code).

Covers the notebook's core capability surface (reference visualization.ipynb
cells 1-20): rebuilding a model from a checkpoint (``load_model``), smoothed
metric curves (``plot_metrics`` — savgol like the notebook), validation-batch
reconstruction (``reconstruct``), and decoding sampled/synthetic latent grids
to image panels (``save_image_grid``). The notebook's exploratory RL latent-
graph cells are out of the capability surface (SURVEY.md §2 C11).

Figures are written to files (headless); matplotlib is imported lazily so the
training path never depends on it.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vqvae_tpu.config import TrainConfig, VQVAEConfig
from vqvae_tpu.train.checkpoint import load_checkpoint
from vqvae_tpu.train.vqvae_train import TrainState, VQVAETrainer


def load_model(
    checkpoint_path: str, x_train_var: float = 1.0
) -> Tuple[VQVAETrainer, TrainState, Dict, Dict]:
    """Rebuild a VQVAE trainer+state from a checkpoint's stored hyperparameters
    (the notebook's ``load_model``, cell 1)."""
    from vqvae_tpu.train.checkpoint import peek_hyperparameters

    hp = peek_hyperparameters(checkpoint_path)
    vq_cfg = VQVAEConfig.from_dict(hp) if hp else VQVAEConfig()
    train_cfg = TrainConfig.from_dict(hp) if hp else TrainConfig()
    trainer = VQVAETrainer(
        vq_cfg, train_cfg, x_train_var=hp.get("x_train_var", x_train_var)
    )
    state, step, metrics, hp = load_checkpoint(checkpoint_path, trainer.init_state())
    return trainer, state, metrics, hp


def smooth(values, window: int = 201, order: int = 7):
    """Savgol smoothing like the notebook's plot_metrics (cell 1)."""
    from scipy.signal import savgol_filter

    values = np.asarray(values, dtype=np.float64)
    if len(values) < window:
        window = max(5, (len(values) // 2) * 2 + 1)
        order = min(order, window - 2)
    return savgol_filter(values, window, order)


def plot_metrics(metrics: Dict, out_path: str) -> str:
    """Smoothed recon-error / loss / perplexity curves -> one PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, key, title in zip(
        axes,
        ["recon_errors", "loss_vals", "perplexities"],
        ["Reconstruction error", "Total loss", "Codebook perplexity"],
    ):
        vals = metrics.get(key, [])
        if len(vals) > 0:
            ax.plot(vals, alpha=0.3, label="raw")
            ax.plot(smooth(vals), label="smoothed")
        ax.set_title(title)
        ax.set_xlabel("update")
        ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def reconstruct(
    trainer: VQVAETrainer, state: TrainState, batch: np.ndarray
) -> np.ndarray:
    """Encode -> quantize -> decode a batch (notebook ``reconstruct``)."""
    model = trainer.model

    @jax.jit
    def recon(params, x):
        z_e = model.apply({"params": params}, x, method=model.encode)
        q = model.apply({"params": params}, z_e, method=model.quantize)
        return model.apply({"params": params}, q.z_q, method=model.decode)

    return np.asarray(recon(jax.device_put(state.params), jnp.asarray(batch)))


def save_image_grid(
    images: np.ndarray, out_path: str, n_cols: int = 8, denormalize: bool = True
) -> str:
    """Tile (N, H, W, 3) images (in [-1, 1] if ``denormalize``) into one PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if denormalize:
        images = np.clip((images + 1.0) / 2.0, 0.0, 1.0)
    n = len(images)
    n_rows = -(-n // n_cols)
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(n_cols * 1.5, n_rows * 1.5))
    axes = np.atleast_2d(axes)
    for i in range(n_rows * n_cols):
        ax = axes[i // n_cols, i % n_cols]
        ax.axis("off")
        if i < n:
            ax.imshow(images[i])
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


__all__ = ["load_model", "plot_metrics", "reconstruct", "save_image_grid", "smooth"]
