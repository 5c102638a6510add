"""Crash / resume: fault injection + async checkpointing (SURVEY.md §5)."""

import numpy as np
import pytest

from vqvae_tpu.config import MeshConfig, TrainConfig, VQVAEConfig
from vqvae_tpu.data.datasets import ArrayDataset
from vqvae_tpu.train.checkpoint import (
    AsyncCheckpointer,
    latest_checkpoint,
    load_checkpoint,
)
from vqvae_tpu.utils.faults import FaultInjector, InjectedFault

VQ = VQVAEConfig(n_hiddens=16, n_residual_hiddens=8, n_embeddings=32, embedding_dim=8)


def _dataset(n=64):
    data = (
        np.random.default_rng(0).standard_normal((n, 32, 32, 3)).astype(np.float32)
    )
    ds = ArrayDataset(data, np.zeros(n, np.int32))
    return ds, ds, 0.06, {"name": "synthetic-test"}


def _cfg(tmp_path, **kw):
    base = dict(
        batch_size=8,
        n_updates=12,
        log_interval=4,
        save=True,
        filename="faulty",
        results_dir=str(tmp_path),
        steps_per_dispatch=1,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_crash_then_resume_matches_uninterrupted(tmp_path):
    from vqvae_tpu.train.vqvae_train import train_vqvae

    ds = _dataset()

    # uninterrupted run -> golden final params
    golden_dir = tmp_path / "golden"
    state_g, hist_g, _ = train_vqvae(
        VQ, _cfg(golden_dir), MeshConfig(), dataset=ds, verbose=False
    )

    # faulty run: crash after step 6 (checkpoints exist at steps 0 and 4)
    crash_dir = tmp_path / "crash"
    inj = FaultInjector(fail_at_step=6)
    with pytest.raises(InjectedFault):
        train_vqvae(
            VQ, _cfg(crash_dir), MeshConfig(), dataset=ds, verbose=False,
            step_hook=inj,
        )
    ckpt = latest_checkpoint(str(crash_dir), "faulty")
    assert ckpt is not None and "step4" in ckpt

    # resume-from-latest: replays the RNG schedule and finishes the run
    state_r, hist_r, _ = train_vqvae(
        VQ, _cfg(crash_dir), MeshConfig(), dataset=ds, verbose=False, resume=True
    )
    assert int(state_r.step) == int(state_g.step)
    # identical batch schedule + identical state => identical final params
    np.testing.assert_allclose(
        np.asarray(state_r.params["codebook"]),
        np.asarray(state_g.params["codebook"]),
        rtol=1e-5,
        atol=1e-7,
    )
    # metric history is stitched: resumed history covers all steps
    assert hist_r.to_dict()["n_updates"] == hist_g.to_dict()["n_updates"]


def test_async_checkpointer_durability_and_error_surfacing(tmp_path):
    import jax.numpy as jnp

    ck = AsyncCheckpointer()
    state = {"w": jnp.arange(8.0)}
    p = str(tmp_path / "a_step1.npz")
    ck.save(p, state, 1, metrics={"m": [1]})
    ck.wait()
    restored, step, metrics, _ = load_checkpoint(p, state)
    assert step == 1
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(8.0))

    # a failing write surfaces on wait()
    ck.save(str(tmp_path / "nonexistent-dir" / "sub" / "x.npz"), state, 2)
    # (save_checkpoint mkdirs, so force an error with an unwritable path)
    ck.wait()  # should not raise — mkdir succeeded; now a real error:
    import os

    ro_dir = tmp_path / "ro"
    ro_dir.mkdir()
    os.chmod(ro_dir, 0o500)
    try:
        if os.access(str(ro_dir), os.W_OK):
            pytest.skip("running as privileged user; cannot make dir read-only")
        ck.save(str(ro_dir / "x.npz"), state, 3)
        with pytest.raises(OSError):
            ck.wait()
    finally:
        os.chmod(ro_dir, 0o700)


def test_fault_injector_fires_once():
    inj = FaultInjector(5)
    inj(4)
    with pytest.raises(InjectedFault):
        inj(5)
    inj(5)  # second pass over the same step: no raise


def test_ema_checkpoint_reloads_via_stored_hyperparameters(tmp_path):
    """Loading a checkpoint must rebuild the model from the checkpoint's OWN
    stored hyperparameters, not the loader's flags (reference load_model
    semantics). Regression: the r5 e2e run trained with --ema_codebook and
    extract-latents crashed on the strict v2 tree match ('unexpected leaves
    ema_counts/ema_means') because it rebuilt a non-EMA template from CLI
    defaults."""
    from types import SimpleNamespace

    from vqvae_tpu.train.checkpoint import (
        load_checkpoint,
        peek_hyperparameters,
        save_checkpoint,
    )
    from vqvae_tpu.train.vqvae_train import VQVAETrainer
    from vqvae_tpu.cli import _vqvae_cfg_for_checkpoint

    vq_cfg = VQVAEConfig(
        n_hiddens=16, n_residual_hiddens=8, n_embeddings=32, embedding_dim=8,
        ema_codebook=True, compute_dtype="bfloat16",
        quantizer_precision="default",
    )
    train_cfg = TrainConfig(batch_size=4)
    trainer = VQVAETrainer(vq_cfg, train_cfg, x_train_var=1.0)
    state = trainer.init_state()
    path = str(tmp_path / "ema_ckpt.npz")
    save_checkpoint(
        path, state, step=7,
        hyperparameters={**train_cfg.to_dict(), **vq_cfg.to_dict()},
    )

    hp = peek_hyperparameters(path)
    assert hp["ema_codebook"] is True and hp["compute_dtype"] == "bfloat16"

    # the CLI helper must reconstruct the EMA config regardless of the
    # loading process's (default, non-EMA) flags
    default_flags = SimpleNamespace(
        n_hiddens=128, n_residual_hiddens=32, n_residual_layers=2,
        embedding_dim=64, n_embeddings=512, beta=0.25,
        share_residual_weights=False,
    )
    cfg2 = _vqvae_cfg_for_checkpoint(path, default_flags)
    assert cfg2 == vq_cfg

    trainer2 = VQVAETrainer(cfg2, TrainConfig(), x_train_var=1.0)
    state2, step, _, _ = load_checkpoint(path, trainer2.init_state())
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(state2.ema_means), np.asarray(state.ema_means)
    )


def test_resume_flag_mismatch_fails_actionably(tmp_path):
    """Resuming with flags that disagree with the checkpoint on a
    tree-affecting model field must name the field, not emit a raw
    'unexpected leaves' tree error."""
    from vqvae_tpu.train.checkpoint import (
        check_hyperparameters_compatible,
        save_checkpoint,
    )
    from vqvae_tpu.train.vqvae_train import VQVAETrainer

    vq_cfg = VQVAEConfig(
        n_hiddens=16, n_residual_hiddens=8, n_embeddings=32, embedding_dim=8,
        ema_codebook=True,
    )
    trainer = VQVAETrainer(vq_cfg, TrainConfig(batch_size=4), x_train_var=1.0)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, trainer.init_state(), step=3,
                    hyperparameters=vq_cfg.to_dict())

    with pytest.raises(ValueError, match="ema_codebook"):
        check_hyperparameters_compatible(
            path, vq_cfg.replace(ema_codebook=False).to_dict(),
            ("n_embeddings", "ema_codebook"),
        )
    # matching flags pass silently
    check_hyperparameters_compatible(
        path, vq_cfg.to_dict(), ("n_embeddings", "ema_codebook")
    )


def test_checkpoint_cfg_helper_sanitizes_backend_and_honors_flags(tmp_path):
    """(a) quantizer_impl is execution dispatch, not model identity: a
    checkpoint trained with impl='pallas' must load as 'auto' so CPU hosts
    work; (b) legacy checkpoints (no stored hyperparameters) fall back to
    the CLI's mode flags including --ema_codebook."""
    from types import SimpleNamespace

    import json as _json

    from vqvae_tpu.cli import _vqvae_cfg_for_checkpoint
    from vqvae_tpu.train.checkpoint import save_checkpoint
    from vqvae_tpu.train.vqvae_train import VQVAETrainer

    vq_cfg = VQVAEConfig(
        n_hiddens=16, n_residual_hiddens=8, n_embeddings=32, embedding_dim=8,
        quantizer_impl="pallas",
    )
    trainer = VQVAETrainer(vq_cfg, TrainConfig(batch_size=4), x_train_var=1.0)
    path = str(tmp_path / "pallas.npz")
    save_checkpoint(path, trainer.init_state(), step=1,
                    hyperparameters=vq_cfg.to_dict())
    cfg = _vqvae_cfg_for_checkpoint(path, SimpleNamespace())
    assert cfg.quantizer_impl == "auto"
    assert cfg.replace(quantizer_impl="pallas") == vq_cfg

    # legacy file: a bare npz without __meta__ -> flag fallback with modes
    legacy = str(tmp_path / "legacy.npz")
    np.savez(legacy, something=np.zeros(3))
    flags = SimpleNamespace(
        n_hiddens=16, n_residual_hiddens=8, n_residual_layers=2,
        embedding_dim=8, n_embeddings=32, beta=0.25,
        share_residual_weights=False, compute_dtype="bfloat16",
        conv_precision="default", quantizer_precision="default",
        ema_codebook=True, ema_decay=0.95,
    )
    cfg2 = _vqvae_cfg_for_checkpoint(legacy, flags)
    assert cfg2.ema_codebook is True and cfg2.ema_decay == 0.95
    assert cfg2.compute_dtype == "bfloat16"
