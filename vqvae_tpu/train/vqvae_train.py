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
from jax.sharding import NamedSharding, PartitionSpec as P

from vqvae_tpu.config import MeshConfig, TrainConfig, VQVAEConfig
from vqvae_tpu.data.datasets import load_dataset
from vqvae_tpu.data.sampler import ReplacementSampler
from vqvae_tpu.models.vqvae import VQVAE
from vqvae_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    put_global,
    replicated_sharding,
    shard_batch,
)
from vqvae_tpu.train.checkpoint import (
    AsyncCheckpointer,
    checkpoint_path,
    save_checkpoint,
)
from vqvae_tpu.train.metrics import MetricHistory, MetricLogger, readable_timestamp


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    # EMA-codebook statistics (None unless VQVAEConfig.ema_codebook):
    ema_counts: Any = None  # (K,)   running assignment counts
    ema_means: Any = None   # (K, D) running sums of assigned encoder outputs


# Adam(amsgrad) with reference-exact torch-1.1.0 semantics by default; see
# train/optim.py for why optax.amsgrad is NOT semantics-identical.
from vqvae_tpu.train.optim import make_optimizer


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
        self.tx = make_optimizer(train_cfg.learning_rate, train_cfg.amsgrad_impl)
        self.n_code = int(mesh_cfg.n_code)
        if mesh is not None:
            self.mesh = mesh
        elif self.n_code > 1:
            from vqvae_tpu.parallel.code_parallel import make_2d_mesh

            self.mesh = make_2d_mesh(
                mesh_cfg.n_data, self.n_code, mesh_cfg.data_axis, mesh_cfg.code_axis
            )
        else:
            self.mesh = make_mesh(mesh_cfg.n_data, mesh_cfg.data_axis)
        if self.n_code > 1 and vq_cfg.n_embeddings % self.n_code != 0:
            raise ValueError(
                f"n_embeddings {vq_cfg.n_embeddings} not divisible by n_code {self.n_code}"
            )
        self._rep = replicated_sharding(self.mesh)
        self._batch_shard = batch_sharding(self.mesh, mesh_cfg.data_axis)
        self._state_shard = self._make_state_sharding()
        self._train_step = jax.jit(
            self._step_impl,
            in_shardings=(self._state_shard, self._batch_shard),
            out_shardings=(self._state_shard, self._rep),
            donate_argnums=(0,),
        )
        # multi-step: batches stacked (K, B, ...), batch dim sharded over data
        self._multi_shard = NamedSharding(
            self.mesh, P(None, mesh_cfg.data_axis)
        )
        self._train_steps = jax.jit(
            self._steps_impl,
            in_shardings=(self._state_shard, self._multi_shard),
            out_shardings=(self._state_shard, self._rep),
            donate_argnums=(0,),
        )
        # device-resident dataset path: gather batches on-device from tiny
        # uploaded index arrays (dataset replicated; the gathered batch's
        # leading dim is sharded over the data axis by GSPMD)
        self._idx_shard = NamedSharding(self.mesh, P(None, mesh_cfg.data_axis))
        self._train_steps_idx = jax.jit(
            self._steps_from_indices_impl,
            in_shardings=(self._state_shard, self._rep, self._idx_shard),
            out_shardings=(self._state_shard, self._rep),
            donate_argnums=(0,),
        )
        self._device_data = None
        self._eval_step = jax.jit(
            self._eval_impl,
            in_shardings=(self._state_shard, self._batch_shard),
            out_shardings=self._rep,
        )

    def _make_state_sharding(self):
        """Per-leaf NamedShardings for TrainState.

        Everything is replicated except, under codebook parallelism
        (n_code > 1), every (K, D)/(K,) codebook-shaped leaf — the codebook
        param, its Adam moments (mu/nu/nu_max mirror the param tree), and the
        EMA stats — which are row-sharded over the ``code`` axis.
        """
        if self.n_code <= 1:
            return self._rep
        from jax.sharding import NamedSharding, PartitionSpec as P

        k = self.vq_cfg.n_embeddings
        d = self.vq_cfg.embedding_dim
        row2d = NamedSharding(self.mesh, P(self.mesh_cfg.code_axis, None))
        row1d = NamedSharding(self.mesh, P(self.mesh_cfg.code_axis))

        def leaf_sharding(leaf):
            shape = getattr(leaf, "shape", ())
            if tuple(shape) == (k, d):
                return row2d
            if tuple(shape) == (k,):
                return row1d
            return self._rep

        state_shapes = jax.eval_shape(self._abstract_init_state)
        return jax.tree_util.tree_map(leaf_sharding, state_shapes)

    def _abstract_init_state(self):
        return self._build_state(jax.random.PRNGKey(self.train_cfg.seed))

    def _build_state(self, rng) -> TrainState:
        dummy = jnp.zeros((1, 32, 32, self.vq_cfg.in_channels), jnp.float32)
        params = self.model.init(rng, dummy)["params"]
        opt_state = self.tx.init(params)
        if self.vq_cfg.ema_codebook:
            ema_counts = jnp.zeros((self.vq_cfg.n_embeddings,), jnp.float32)
            # explicit copy: donating a state that aliases params["codebook"]
            # twice trips "donate the same buffer twice"
            ema_means = jnp.array(params["codebook"], jnp.float32, copy=True)
        else:
            ema_counts = ema_means = None
        return TrainState(
            params, opt_state, jnp.zeros((), jnp.int32), ema_counts, ema_means
        )

    # -- state ---------------------------------------------------------------

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        if rng is None:
            rng = jax.random.PRNGKey(self.train_cfg.seed)
        # put_global: multi-process-safe placement (every process builds the
        # same state from the shared seed; each serves its devices' shards)
        return put_global(self._build_state(rng), self._state_shard)

    # -- steps ---------------------------------------------------------------

    def _quantize(self, params, z_e):
        """VQ bottleneck: sharded-codebook path under codebook parallelism."""
        if self.n_code > 1:
            from vqvae_tpu.parallel.code_parallel import quantize_sharded

            return quantize_sharded(
                z_e,
                params["codebook"],
                self.vq_cfg.beta,
                self.mesh,
                self.mesh_cfg.data_axis,
                self.mesh_cfg.code_axis,
                ema=self.vq_cfg.ema_codebook,
                precision=self.vq_cfg.quantizer_precision,
            )
        return self.model.apply({"params": params}, z_e, method=self.model.quantize)

    def _step_impl(self, state: TrainState, x) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        model = self.model
        ema = self.vq_cfg.ema_codebook

        def loss_fn(params):
            z_e = model.apply({"params": params}, x, method=model.encode)
            q = self._quantize(params, z_e)
            x_hat = model.apply({"params": params}, q.z_q, method=model.decode)
            recon_loss = jnp.mean((x_hat - x) ** 2) / self.x_train_var
            loss = recon_loss + q.loss
            return loss, (recon_loss, q.perplexity, q.counts, q.indices, z_e)

        (loss, (recon, perp, counts, indices, z_e)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        if ema:
            # EMA codebook update (replicated stats; with a sharded batch XLA
            # all-reduces the per-device partial counts/sums over ICI).
            cfg = self.vq_cfg
            gamma, eps, k = cfg.ema_decay, cfg.ema_epsilon, cfg.n_embeddings
            z_flat = jax.lax.stop_gradient(z_e).reshape(-1, z_e.shape[-1])
            z_sums = jax.ops.segment_sum(
                z_flat, indices.reshape(-1), num_segments=k
            )
            new_counts = gamma * state.ema_counts + (1.0 - gamma) * counts
            new_means = gamma * state.ema_means + (1.0 - gamma) * z_sums
            n_total = jnp.sum(new_counts)
            smoothed = (new_counts + eps) / (n_total + k * eps) * n_total
            params = {**params, "codebook": new_means / smoothed[:, None]}
            new_state = TrainState(
                params, opt_state, state.step + 1, new_counts, new_means
            )
        else:
            new_state = TrainState(
                params, opt_state, state.step + 1, state.ema_counts, state.ema_means
            )
        metrics = {"loss": loss, "recon_error": recon, "perplexity": perp}
        return new_state, metrics

    def _steps_impl(self, state: TrainState, xs):
        """K sequential updates in one dispatch: lax.scan over stacked batches.

        Semantically identical to K calls of ``_step_impl`` (same update
        order); returns per-step metrics stacked on the leading axis.
        """
        return jax.lax.scan(self._step_impl, state, xs)

    def _steps_from_indices_impl(self, state: TrainState, data, idx):
        """K updates gathering each batch from the device-resident dataset.

        data: (N, H, W, C) replicated; idx: (K, B) int32.
        """

        def body(s, ii):
            return self._step_impl(s, jnp.take(data, ii, axis=0))

        return jax.lax.scan(body, state, idx)

    def _eval_impl(self, state: TrainState, x) -> Dict[str, jnp.ndarray]:
        model, params = self.model, state.params
        z_e = model.apply({"params": params}, x, method=model.encode)
        q = self._quantize(params, z_e)
        x_hat = model.apply({"params": params}, q.z_q, method=model.decode)
        emb_loss, perplexity = q.loss, q.perplexity
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

    def steps(self, state: TrainState, batches_np) -> Tuple[TrainState, Dict]:
        """Run K = len(batches_np) updates in one device dispatch.

        batches_np: (K, B_local, H, W, C). Returns (state, metrics) where each
        metric is a (K,) array of per-step values.

        Inputs that are already device-resident ``jax.Array``s pass through
        without a host round-trip (device_put on a committed array with the
        target sharding is a no-op / device-side reshard) — pulling them to
        host with np.asarray and re-uploading would put two full dataset
        transfers on the link (ADVICE r3: at batch 256 that is ~630 MB per
        bench run timed as if it were step compute).
        """
        import numpy as _np

        if isinstance(batches_np, jax.Array):
            xs = jax.device_put(batches_np, self._multi_shard)
        elif jax.process_count() == 1:
            xs = jax.device_put(_np.asarray(batches_np), self._multi_shard)
        else:
            xs = jax.make_array_from_process_local_data(
                self._multi_shard, _np.asarray(batches_np)
            )
        return self._train_steps(state, xs)

    def stage_dataset(self, data_np) -> None:
        """Place the training images in device HBM (replicated) once."""
        self._device_data = put_global(np.asarray(data_np), self._rep)

    def steps_by_index(self, state: TrainState, idx_np) -> Tuple[TrainState, Dict]:
        """K updates gathered on-device from the staged dataset.

        idx_np: (K, B_global) int — only these tiny index arrays cross the
        host->device link. Requires a prior ``stage_dataset`` call.
        """
        if self._device_data is None:
            raise RuntimeError("call stage_dataset() before steps_by_index()")
        arr = np.asarray(idx_np, np.int32)
        if jax.process_count() == 1:
            idx = jax.device_put(arr, self._idx_shard)
        else:
            idx = jax.make_array_from_process_local_data(self._idx_shard, arr)
        return self._train_steps_idx(state, self._device_data, idx)

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
    step_hook=None,
) -> Tuple[TrainState, MetricHistory, VQVAETrainer]:
    """Full training loop reproducing main.py:67-98 semantics.

    ``dataset``: optional (train, val, x_train_var, info) tuple to skip loading.
    ``resume``: restore the latest step-tagged checkpoint for this run name and
    continue from its step counter with its metric history (the resume path
    the reference lacks — SURVEY.md §5 checkpoint/resume).
    ``step_hook``: optional callable(step_index) invoked after each completed
    update — the fault-injection point for elastic-recovery tests
    (utils/faults.py; SURVEY.md §5 failure-detection row).
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
        from vqvae_tpu.train.checkpoint import (
            check_hyperparameters_compatible,
            latest_checkpoint,
            load_checkpoint,
        )

        ckpt = latest_checkpoint(train_cfg.results_dir, name)
        if ckpt is not None:
            # actionable error when flags disagree with the checkpoint on
            # tree-affecting model fields (e.g. resuming an --ema_codebook
            # run without the flag)
            check_hyperparameters_compatible(
                ckpt, vq_cfg.to_dict(),
                ("in_channels", "n_hiddens", "n_residual_hiddens",
                 "n_residual_layers", "embedding_dim", "n_embeddings",
                 "share_residual_weights", "ema_codebook"),
            )
            state, step, saved_metrics, _hp = load_checkpoint(ckpt, state)
            state = put_global(state, trainer._state_shard)
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
    ckpt_writer = AsyncCheckpointer()

    spd = max(1, train_cfg.steps_per_dispatch)
    li = train_cfg.log_interval
    use_device_data = (
        spd > 1
        and train_cfg.device_data
        and train_ds.data.nbytes <= train_cfg.device_data_max_bytes
    )
    if use_device_data:
        trainer.stage_dataset(train_ds.data)
    i = start_step
    try:
        while i < train_cfg.n_updates:
            # Chunks end exactly ON log-interval boundary steps (s % li == 0) so
            # the print/checkpoint cadence matches the reference's (main.py:86).
            boundary = i if i % li == 0 else i + (li - i % li)
            k = min(spd, train_cfg.n_updates - i, boundary - i + 1)
            if k == 1:
                state, metrics = trainer.step(state, train_ds.data[sampler.next_indices()])
                ms = [metrics]
            else:
                if use_device_data:
                    idx = np.stack([sampler.next_indices() for _ in range(k)])
                    state, stacked = trainer.steps_by_index(state, idx)
                else:
                    batches = np.stack(
                        [train_ds.data[sampler.next_indices()] for _ in range(k)]
                    )
                    state, stacked = trainer.steps(state, batches)
                host = {key: np.asarray(v) for key, v in stacked.items()}
                ms = [{key: host[key][j] for key in host} for j in range(k)]

            for j, m in enumerate(ms):
                step_idx = i + j
                history.append(
                    float(m["recon_error"]), float(m["loss"]), float(m["perplexity"]),
                    step_idx,
                )
                logger.log_step(history, step_idx)
                if step_hook is not None:
                    step_hook(step_idx)
            i += k
            last = i - 1
            if train_cfg.save and (last % li == 0 or i >= train_cfg.n_updates):
                ckpt_writer.save(
                    checkpoint_path(train_cfg.results_dir, name, last),
                    state,
                    last,
                    metrics=history.to_dict(),
                    hyperparameters=hyperparameters,
                )

    finally:
        # an injected fault / crash mid-loop must still leave the last
        # checkpoint durable for resume-from-latest
        ckpt_writer.wait()
        logger.close()
    return state, history, trainer


__all__ = ["VQVAETrainer", "TrainState", "train_vqvae", "make_optimizer"]
