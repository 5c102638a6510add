"""Real multi-process execution of the distributed path (VERDICT round-1 gap).

Launches 2 OS processes x 4 virtual CPU devices each (tools/mp_worker.py),
rendezvoused through ``jax.distributed.initialize`` with gloo collectives, and
asserts the trained metrics and final params match a single-process run over
the same 8-device mesh and the same global batch schedule. This executes the
branches no single-process test can reach: parallel/distributed.py's
initialize, shard_batch's make_array_from_process_local_data path, the
multi-process steps()/steps_by_index() branches, and put_global's
make_array_from_callback placement (parallel/mesh.py).

The reference has no distributed support at all (SURVEY.md §2: "Parallelism
strategies in the reference: NONE"); the oracle is our own single-process
trainer, which is itself parity-tested against the torch reference.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from vqvae_tpu.config import MeshConfig, TrainConfig, VQVAEConfig
from vqvae_tpu.data.sampler import ReplacementSampler
from vqvae_tpu.train.vqvae_train import VQVAETrainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "mp_worker.py")

STEPS = 10
BATCH = 16
SEED = 0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    # Workers must not inherit the test session's 8-device XLA_FLAGS (they set
    # their own 4-device count) nor any leftover distributed service state.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    return env


def _run_cluster(tmp_path, n_code: int = 1, ema: bool = False) -> dict:
    port = _free_port()
    out = str(tmp_path / "proc0.npz")
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, WORKER,
            "--process_id", str(pid), "--num_processes", "2",
            "--coordinator", f"127.0.0.1:{port}",
            "--local_devices", "4",
            "--steps", str(STEPS), "--batch_size", str(BATCH),
            "--seed", str(SEED), "--n_code", str(n_code),
        ] + (["--ema"] if ema else []) + (["--out", out] if pid == 0 else [])
        procs.append(
            subprocess.Popen(
                cmd, env=_clean_env(),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"
    with np.load(out) as data:
        return {k: np.asarray(v) for k, v in data.items()}


def _single_process_reference(n_code: int = 1, ema: bool = False):
    """The same schedule on the in-test 8-device mesh, single process."""
    vq_cfg = VQVAEConfig(
        n_hiddens=16, n_residual_hiddens=8, n_embeddings=64, embedding_dim=16,
        ema_codebook=ema,
    )
    train_cfg = TrainConfig(batch_size=BATCH, seed=SEED)
    mesh_cfg = MeshConfig(n_code=n_code, n_data=8 // n_code if n_code > 1 else None)
    trainer = VQVAETrainer(vq_cfg, train_cfg, mesh_cfg, x_train_var=0.06)
    state = trainer.init_state()
    data = np.random.default_rng(1).standard_normal((128, 32, 32, 3)).astype(
        np.float32
    )
    sampler = ReplacementSampler(len(data), BATCH, seed=SEED)

    metrics = {"loss": [], "recon_error": [], "perplexity": []}

    def record(ms):
        for k in metrics:
            metrics[k].extend(float(v) for v in np.atleast_1d(np.asarray(ms[k])))

    for _ in range(2):
        state, m = trainer.step(state, data[sampler.next_indices()])
        record(m)
    k1 = (STEPS - 2) // 2
    batches = np.stack([data[sampler.next_indices()] for _ in range(k1)])
    state, ms = trainer.steps(state, batches)
    record(ms)
    k2 = STEPS - 2 - k1
    trainer.stage_dataset(data)
    idx = np.stack([sampler.next_indices() for _ in range(k2)])
    state, ms = trainer.steps_by_index(state, idx)
    record(ms)
    return state, metrics


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    got = _run_cluster(tmp_path)
    assert int(got["__step__"]) == STEPS

    state, metrics = _single_process_reference()
    for k in metrics:
        np.testing.assert_allclose(
            got[f"metric.{k}"], np.asarray(metrics[k]), rtol=1e-4, atol=1e-6,
            err_msg=f"metric {k} diverged between 2-process and single-process",
        )

    flat, _ = jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(np.asarray, state.params)
    )
    for kp, want in flat:
        key = f"param.{jax.tree_util.keystr(kp)}"
        np.testing.assert_allclose(
            got[key], want, rtol=1e-4, atol=1e-6, err_msg=f"param {key} diverged"
        )


@pytest.mark.slow
def test_two_process_codebook_parallel_matches_single_process(tmp_path):
    """2 processes x 4 devices, 2-D (data=4, code=2) mesh: the sharded-codebook
    argmin-combine + sharded Adam moments run across a real process boundary."""
    got = _run_cluster(tmp_path, n_code=2)
    assert int(got["__step__"]) == STEPS

    state, metrics = _single_process_reference(n_code=2)
    for k in metrics:
        np.testing.assert_allclose(
            got[f"metric.{k}"], np.asarray(metrics[k]), rtol=1e-4, atol=1e-6,
            err_msg=f"metric {k} diverged (codebook-parallel)",
        )

    def to_host(a):
        out = np.zeros(a.shape, a.dtype)
        for shard in a.addressable_shards:
            out[shard.index] = np.asarray(shard.data)
        return out

    flat, _ = jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(to_host, state.params)
    )
    for kp, want in flat:
        key = f"param.{jax.tree_util.keystr(kp)}"
        np.testing.assert_allclose(
            got[key], want, rtol=1e-4, atol=1e-6, err_msg=f"param {key} diverged"
        )
