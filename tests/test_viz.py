"""Visualization/eval pipeline tests (headless)."""

import os

import numpy as np

import jax

from vqvae_tpu.config import MeshConfig, TrainConfig, VQVAEConfig
from vqvae_tpu.pipelines.viz import load_model, plot_metrics, reconstruct, save_image_grid, smooth
from vqvae_tpu.train.checkpoint import save_checkpoint
from vqvae_tpu.train.vqvae_train import VQVAETrainer


def test_plot_metrics_and_grid(tmp_path):
    metrics = {
        "recon_errors": list(np.random.default_rng(0).uniform(1, 4, 300)),
        "loss_vals": list(np.random.default_rng(1).uniform(1, 50, 300)),
        "perplexities": list(np.random.default_rng(2).uniform(1, 100, 300)),
    }
    p = plot_metrics(metrics, str(tmp_path / "metrics.png"))
    assert os.path.getsize(p) > 1000

    imgs = np.random.default_rng(3).uniform(-1, 1, (10, 32, 32, 3)).astype(np.float32)
    g = save_image_grid(imgs, str(tmp_path / "grid.png"))
    assert os.path.getsize(g) > 1000


def test_smooth_short_series():
    out = smooth([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    assert len(out) == 7


def test_load_model_roundtrip(tmp_path):
    cfg = VQVAEConfig(n_hiddens=16, n_residual_hiddens=8, n_embeddings=32,
                      embedding_dim=8)
    trainer = VQVAETrainer(cfg, TrainConfig(), MeshConfig(), x_train_var=0.05)
    state = trainer.init_state()
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(
        path, state, 7,
        metrics={"recon_errors": [1.0]},
        hyperparameters={**cfg.to_dict(), **TrainConfig().to_dict(), "x_train_var": 0.05},
    )
    trainer2, state2, metrics, hp = load_model(path)
    assert trainer2.vq_cfg.n_hiddens == 16
    assert trainer2.x_train_var == 0.05
    assert metrics["recon_errors"] == [1.0]

    batch = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
    out = reconstruct(trainer2, state2, batch)
    assert out.shape == batch.shape
