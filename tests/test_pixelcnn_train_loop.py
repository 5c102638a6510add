"""train_pixelcnn epoch-loop tests: best-val checkpointing, per-epoch sample
generation (reference pixelcnn/gated_pixelcnn.py:143-149,153-169), and the
resume path the reference lacks.
"""

import numpy as np

from vqvae_tpu.config import PixelCNNConfig, TrainConfig
from vqvae_tpu.data.datasets import ArrayDataset
from vqvae_tpu.train.pixelcnn_train import train_pixelcnn


def _tiny_latents(n=48, k=16, side=4, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, k, size=(n, side, side)).astype(np.int32)
    labels = rng.integers(0, 10, size=(n,)).astype(np.int32)
    return ArrayDataset(data, labels)


def _cfgs(epochs=3, gen_samples=False):
    cfg = PixelCNNConfig(input_dim=16, dim=16, n_layers=2, n_classes=10, img_dim=4)
    train_cfg = TrainConfig(
        batch_size=8, epochs=epochs, learning_rate=3e-4, log_interval=100,
        seed=0, gen_samples=gen_samples,
    )
    return cfg, train_cfg


def test_epoch_loop_trains_and_checkpoints(tmp_path):
    cfg, train_cfg = _cfgs(epochs=3, gen_samples=True)
    save_path = str(tmp_path / "prior.npz")
    state, out = train_pixelcnn(
        cfg, train_cfg, _tiny_latents(seed=0), _tiny_latents(n=16, seed=1),
        verbose=False, save_path=save_path,
    )
    hist = out["history"]
    assert len(hist["train_loss"]) == 2  # epochs 1..2 (reference range(1, epochs))
    assert len(hist["val_loss"]) == 2
    assert np.isfinite(hist["train_loss"]).all()
    assert (tmp_path / "prior.npz").exists()
    # gen_samples: one (100, 4, 4) grid batch per epoch, values in [0, K)
    assert len(out["samples"]) == 2
    assert out["samples"][0].shape == (100, 4, 4)
    assert out["samples"][0].min() >= 0 and out["samples"][0].max() < 16


def test_resume_continues_from_saved_epoch(tmp_path):
    cfg, train_cfg = _cfgs(epochs=4)
    save_path = str(tmp_path / "prior.npz")
    train, val = _tiny_latents(seed=0), _tiny_latents(n=16, seed=1)

    # uninterrupted 1..3
    _, full = train_pixelcnn(
        cfg, train_cfg.replace(save=True), train, val,
        verbose=False, save_path=str(tmp_path / "full.npz"),
    )

    # interrupted: epochs 1..1, then resume 2..3 (save every epoch so the
    # checkpoint tags the last completed epoch, like a crash at epoch end)
    _, _ = train_pixelcnn(
        cfg, train_cfg.replace(epochs=2, save=True), train, val,
        verbose=False, save_path=save_path,
    )
    _, resumed = train_pixelcnn(
        cfg, train_cfg.replace(save=True), train, val,
        verbose=False, save_path=save_path, resume=True,
    )
    # the resumed run's combined history matches the uninterrupted run
    np.testing.assert_allclose(
        resumed["history"]["train_loss"], full["history"]["train_loss"],
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        resumed["history"]["val_loss"], full["history"]["val_loss"],
        rtol=1e-5, atol=1e-7,
    )


def test_steps_per_dispatch_equivalence():
    """The scan/device-data path (steps_per_dispatch>1, on-device index
    gathers) reproduces the per-step losses and val curve of the
    reference-style one-dispatch-per-step loop."""
    cfg, train_cfg = _cfgs(epochs=3)
    train, val = _tiny_latents(seed=0), _tiny_latents(n=16, seed=1)

    _, a = train_pixelcnn(cfg, train_cfg, train, val, verbose=False)
    _, b = train_pixelcnn(
        cfg, train_cfg.replace(steps_per_dispatch=4), train, val, verbose=False
    )
    np.testing.assert_allclose(
        a["history"]["train_loss"], b["history"]["train_loss"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        a["history"]["val_loss"], b["history"]["val_loss"], rtol=1e-5, atol=1e-6
    )
