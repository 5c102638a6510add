"""VQ-VAE training runtime (reference main.py:49-98, TPU-first re-design).

One jitted train step — forward, loss, backward, Adam(amsgrad) update — runs
under ``jit`` with explicit shardings over the data-parallel mesh: state
replicated, batch sharded on the ``data`` axis, XLA inserting the gradient
all-reduce over ICI. State is donated, so params update in place in HBM.

Loss parity (main.py:75-76):
    recon_loss = mean((x_hat - x)^2) / x_train_var
    loss = recon_loss + embedding_loss

The metric D2H syncs the reference does 3x per step (main.py:81-83) are
batched here: device scalars are buffered and only materialized at the log
cadence, keeping the step loop free of host round-trips.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqvae_tpu.config import MeshConfig, TrainConfig, VQVAEConfig
from vqvae_tpu.data.datasets import load_dataset
from vqvae_tpu.data.sampler import ReplacementSampler
from vqvae_tpu.models.vqvae import VQVAE
from vqvae_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from vqvae_tpu.train.checkpoint import checkpoint_path, save_checkpoint
from vqvae_tpu.train.metrics import MetricHistory, MetricLogger, readable_timestamp


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    """Adam with AMSGrad, torch-default betas/eps (reference main.py:55)."""
    return optax.amsgrad(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


class VQVAETrainer:
    """Owns model/optimizer/mesh and the jitted step; reusable by CLI, tests, bench."""

    def __init__(
        self,
        vq_cfg: VQVAEConfig = VQVAEConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        mesh_cfg: MeshConfig = MeshConfig(),
        x_train_var: float = 1.0,
        mesh=None,
    ):
        self.vq_cfg = vq_cfg
        self.train_cfg = train_cfg
        self.mesh_cfg = mesh_cfg
        self.x_train_var = float(x_train_var)
        self.model = VQVAE(vq_cfg)
        self.tx = make_optimizer(train_cfg.learning_rate)
        self.mesh = mesh if mesh is not None else make_mesh(
            mesh_cfg.n_data, mesh_cfg.data_axis
        )
        self._rep = replicated_sharding(self.mesh)
        self._batch_shard = batch_sharding(self.mesh, mesh_cfg.data_axis)
        self._train_step = jax.jit(
            self._step_impl,
            in_shardings=(self._rep, self._batch_shard),
            out_shardings=(self._rep, self._rep),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            self._eval_impl,
            in_shardings=(self._rep, self._batch_shard),
            out_shardings=self._rep,
        )

    # -- state ---------------------------------------------------------------

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        if rng is None:
            rng = jax.random.PRNGKey(self.train_cfg.seed)
        img = 32
        dummy = jnp.zeros((1, img, img, self.vq_cfg.in_channels), jnp.float32)
        params = self.model.init(rng, dummy)["params"]
        opt_state = self.tx.init(params)
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        return jax.device_put(state, self._rep)

    # -- steps ---------------------------------------------------------------

    def _step_impl(self, state: TrainState, x) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            emb_loss, x_hat, perplexity = self.model.apply({"params": params}, x)
            recon_loss = jnp.mean((x_hat - x) ** 2) / self.x_train_var
            loss = recon_loss + emb_loss
            return loss, (recon_loss, perplexity)

        (loss, (recon, perp)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        metrics = {"loss": loss, "recon_error": recon, "perplexity": perp}
        return new_state, metrics

    def _eval_impl(self, state: TrainState, x) -> Dict[str, jnp.ndarray]:
        emb_loss, x_hat, perplexity = self.model.apply({"params": state.params}, x)
        recon_loss = jnp.mean((x_hat - x) ** 2) / self.x_train_var
        return {
            "loss": recon_loss + emb_loss,
            "recon_error": recon_loss,
            "perplexity": perplexity,
            "x_hat": x_hat,
        }

    def step(self, state: TrainState, batch_np) -> Tuple[TrainState, Dict]:
        x = shard_batch(batch_np, self.mesh, self.mesh_cfg.data_axis)
        return self._train_step(state, x)

    def eval_batch(self, state: TrainState, batch_np) -> Dict:
        x = shard_batch(batch_np, self.mesh, self.mesh_cfg.data_axis)
        return self._eval_step(state, x)


def train_vqvae(
    vq_cfg: VQVAEConfig = VQVAEConfig(),
    train_cfg: TrainConfig = TrainConfig(),
    mesh_cfg: MeshConfig = MeshConfig(),
    dataset=None,
    verbose: bool = True,
    resume: bool = False,
) -> Tuple[TrainState, MetricHistory, VQVAETrainer]:
    """Full training loop reproducing main.py:67-98 semantics.

    ``dataset``: optional (train, val, x_train_var, info) tuple to skip loading.
    ``resume``: restore the latest step-tagged checkpoint for this run name and
    continue from its step counter with its metric history (the resume path
    the reference lacks — SURVEY.md §5 checkpoint/resume).
    """
    if dataset is None:
        dataset = load_dataset(train_cfg.dataset, train_cfg.data_dir)
    train_ds, _val_ds, x_train_var, info = dataset

    trainer = VQVAETrainer(vq_cfg, train_cfg, mesh_cfg, x_train_var=x_train_var)
    state = trainer.init_state()

    history = MetricHistory()
    name = train_cfg.filename or readable_timestamp()
    start_step = 0
    if resume:
        from vqvae_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

        ckpt = latest_checkpoint(train_cfg.results_dir, name)
        if ckpt is not None:
            state, step, saved_metrics, _hp = load_checkpoint(ckpt, state)
            state = jax.device_put(state, trainer._rep)
            history = MetricHistory.from_dict(saved_metrics)
            start_step = step + 1
            if verbose and jax.process_index() == 0:
                print(f"Resumed from {ckpt} at step {step}", flush=True)

    sampler = ReplacementSampler(
        len(train_ds),
        train_cfg.batch_size,
        seed=train_cfg.seed,
        num_shards=jax.process_count(),
        shard_id=jax.process_index(),
    )
    # replay the RNG schedule so a resumed run sees the batches it would have
    for _ in range(start_step):
        sampler.next_indices()
    logger = MetricLogger(
        log_interval=train_cfg.log_interval,
        jsonl_path=(
            f"{train_cfg.results_dir}/vqvae_{name}_metrics.jsonl"
            if train_cfg.save
            else None
        ),
        is_primary=jax.process_index() == 0 and verbose,
    )
    hyperparameters = {
        **train_cfg.to_dict(),
        **vq_cfg.to_dict(),
        "x_train_var": x_train_var,
        "dataset_info": info,
    }

    pending = []  # buffered device metrics, flushed at log cadence
    for i in range(start_step, train_cfg.n_updates):
        batch = train_ds.data[sampler.next_indices()]
        state, metrics = trainer.step(state, batch)
        pending.append(metrics)

        if i % train_cfg.log_interval == 0 or i == train_cfg.n_updates - 1:
            for j, m in enumerate(pending):
                step_idx = i - len(pending) + 1 + j
                history.append(
                    float(m["recon_error"]), float(m["loss"]), float(m["perplexity"]),
                    step_idx,
                )
                logger.log_step(history, step_idx)
            pending = []
            if train_cfg.save:
                save_checkpoint(
                    checkpoint_path(train_cfg.results_dir, name, i),
                    state,
                    i,
                    metrics=history.to_dict(),
                    hyperparameters=hyperparameters,
                )

    logger.close()
    return state, history, trainer


__all__ = ["VQVAETrainer", "TrainState", "train_vqvae", "make_optimizer"]
