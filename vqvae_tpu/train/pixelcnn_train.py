"""GatedPixelCNN prior training (reference pixelcnn/gated_pixelcnn.py:78-169).

Epoch-based loop over LATENT_BLOCK code grids with cross-entropy over the
codebook classes, plain Adam (the prior uses no amsgrad — reference
gated_pixelcnn.py:71), per-epoch validation, and best-validation-loss
checkpointing (gated_pixelcnn.py:153-169). The step is jitted with the same
mesh shardings as the VQ-VAE trainer.

Loss parity: CE over logits reshaped to (B*H*W, n_embeddings) against the
flattened grid (gated_pixelcnn.py:92-97) == mean softmax cross-entropy.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqvae_tpu.config import MeshConfig, PixelCNNConfig, TrainConfig
from vqvae_tpu.data.datasets import ArrayDataset
from vqvae_tpu.data.sampler import EpochSampler
from vqvae_tpu.models.pixelcnn import GatedPixelCNN
from vqvae_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from vqvae_tpu.train.checkpoint import AsyncCheckpointer, load_checkpoint


class PixelCNNState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class PixelCNNTrainer:
    def __init__(
        self,
        cfg: PixelCNNConfig = PixelCNNConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        mesh_cfg: MeshConfig = MeshConfig(),
        mesh=None,
    ):
        self.cfg = cfg
        self.train_cfg = train_cfg
        self.mesh_cfg = mesh_cfg
        self.model = GatedPixelCNN(cfg)
        self.tx = optax.adam(train_cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
        self.mesh = mesh if mesh is not None else make_mesh(
            mesh_cfg.n_data, mesh_cfg.data_axis
        )
        self._rep = replicated_sharding(self.mesh)
        self._batch_shard = batch_sharding(self.mesh, mesh_cfg.data_axis)
        self._train_step = jax.jit(
            self._step_impl,
            in_shardings=(self._rep, self._batch_shard, self._batch_shard),
            out_shardings=(self._rep, self._rep),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            self._loss_impl,
            in_shardings=(self._rep, self._batch_shard, self._batch_shard),
            out_shardings=self._rep,
        )
        # multi-step scan paths (mirror VQVAETrainer): stacked (K, B, ...)
        # batches, batch dim sharded over the data axis
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._multi_shard = NamedSharding(self.mesh, P(None, mesh_cfg.data_axis))
        self._train_steps = jax.jit(
            self._steps_impl,
            in_shardings=(self._rep, self._multi_shard, self._multi_shard),
            out_shardings=(self._rep, self._rep),
            donate_argnums=(0,),
        )
        # device-resident dataset: the latent grids are tiny (50k 8x8 int32
        # grids = 12.8 MB) — stage once, gather each scan step on device from
        # uploaded (K, B) index arrays
        self._train_steps_idx = jax.jit(
            self._steps_from_indices_impl,
            in_shardings=(self._rep, self._rep, self._rep, self._multi_shard),
            out_shardings=(self._rep, self._rep),
            donate_argnums=(0,),
        )
        self._eval_many = jax.jit(
            self._eval_many_impl,
            in_shardings=(self._rep, self._rep, self._rep, self._multi_shard),
            out_shardings=self._rep,
        )
        self._device_data = None
        self._device_labels = None
        self._device_val = None
        self._device_val_labels = None

    def init_state(self, rng: Optional[jax.Array] = None) -> PixelCNNState:
        if rng is None:
            rng = jax.random.PRNGKey(self.train_cfg.seed)
        d = self.cfg.img_dim
        dummy_x = jnp.zeros((1, d, d), jnp.int32)
        dummy_l = jnp.zeros((1,), jnp.int32)
        params = self.model.init(rng, dummy_x, dummy_l)["params"]
        opt_state = self.tx.init(params)
        return jax.device_put(
            PixelCNNState(params, opt_state, jnp.zeros((), jnp.int32)), self._rep
        )

    def _loss_impl(self, params_or_state, x, label):
        params = (
            params_or_state.params
            if isinstance(params_or_state, PixelCNNState)
            else params_or_state
        )
        logits = self.model.apply({"params": params}, x, label)  # (B,H,W,K)
        k = logits.shape[-1]
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, k), x.reshape(-1)
        )
        return jnp.mean(ce)

    def _step_impl(self, state: PixelCNNState, x, label):
        loss, grads = jax.value_and_grad(self._loss_impl)(state.params, x, label)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return PixelCNNState(params, opt_state, state.step + 1), loss

    def _steps_impl(self, state: PixelCNNState, xs, labels):
        """K sequential updates in one dispatch (lax.scan over stacked
        batches) — same update order as K ``_step_impl`` calls; returns the
        per-step losses stacked (K,)."""

        def body(s, xl):
            return self._step_impl(s, *xl)

        return jax.lax.scan(body, state, (xs, labels))

    def _steps_from_indices_impl(self, state, data, data_labels, idx):
        """K updates gathering batches on-device from the staged grids.

        data: (N, H, W) int32 replicated; data_labels: (N,); idx: (K, B)."""

        def body(s, ii):
            return self._step_impl(
                s, jnp.take(data, ii, axis=0), jnp.take(data_labels, ii, axis=0)
            )

        return jax.lax.scan(body, state, idx)

    def _eval_many_impl(self, state, data, data_labels, idx):
        """Mean loss over K on-device-gathered validation batches in one
        dispatch (the reference's per-batch eval loop collapsed to a scan)."""

        def body(_, ii):
            return None, self._loss_impl(
                state, jnp.take(data, ii, axis=0), jnp.take(data_labels, ii, axis=0)
            )

        _, losses = jax.lax.scan(body, None, idx)
        return losses

    def stage_dataset(self, train_ds: ArrayDataset, val_ds: ArrayDataset) -> None:
        """Place the (tiny) latent grids + labels in device HBM once."""
        from vqvae_tpu.parallel.mesh import put_global

        self._device_data = put_global(
            np.asarray(train_ds.data, np.int32), self._rep
        )
        self._device_labels = put_global(
            np.asarray(train_ds.labels, np.int32), self._rep
        )
        self._device_val = put_global(np.asarray(val_ds.data, np.int32), self._rep)
        self._device_val_labels = put_global(
            np.asarray(val_ds.labels, np.int32), self._rep
        )

    def _put_idx(self, idx_np):
        arr = np.asarray(idx_np, np.int32)
        if jax.process_count() == 1:
            return jax.device_put(arr, self._multi_shard)
        return jax.make_array_from_process_local_data(self._multi_shard, arr)

    def steps_by_index(self, state, idx_np):
        """K updates from (K, B) sampler indices; requires stage_dataset."""
        if self._device_data is None:
            raise RuntimeError("call stage_dataset() before steps_by_index()")
        return self._train_steps_idx(
            state, self._device_data, self._device_labels, self._put_idx(idx_np)
        )

    def eval_by_index(self, state, idx_np):
        """(K,) per-batch validation losses from (K, B) indices, one dispatch."""
        if self._device_data is None:
            raise RuntimeError("call stage_dataset() before eval_by_index()")
        return self._eval_many(
            state, self._device_val, self._device_val_labels, self._put_idx(idx_np)
        )

    def steps(self, state, xs, labels):
        """K stacked updates in one dispatch; device-resident jax.Arrays pass
        through without a host round-trip (see VQVAETrainer.steps)."""
        if not isinstance(xs, jax.Array):
            xs = np.asarray(xs, np.int32)
            labels = np.asarray(labels, np.int32)
            if jax.process_count() > 1:
                xs = jax.make_array_from_process_local_data(self._multi_shard, xs)
                labels = jax.make_array_from_process_local_data(
                    self._multi_shard, labels
                )
        xs = jax.device_put(xs, self._multi_shard)
        labels = jax.device_put(labels, self._multi_shard)
        return self._train_steps(state, xs, labels)

    def step(self, state, x_np, label_np):
        x = shard_batch(np.asarray(x_np, np.int32), self.mesh, self.mesh_cfg.data_axis)
        lab = shard_batch(
            np.asarray(label_np, np.int32), self.mesh, self.mesh_cfg.data_axis
        )
        return self._train_step(state, x, lab)

    def eval_loss(self, state, x_np, label_np):
        x = shard_batch(np.asarray(x_np, np.int32), self.mesh, self.mesh_cfg.data_axis)
        lab = shard_batch(
            np.asarray(label_np, np.int32), self.mesh, self.mesh_cfg.data_axis
        )
        return self._eval_step(state, x, lab)

    def generate(self, state, labels_np, rng=None, shape=None, cached: bool = True):
        """Autoregressive sampling.

        cached=True (default): incremental row/column-cached decoder
        (models/pixelcnn_sampler.py) — ~W-times fewer FLOPs than the
        reference's one-full-forward-per-pixel loop, verified sample-identical.
        cached=False: the jitted full-forward scan (reference semantics,
        kept as the correctness oracle).
        """
        if rng is None:
            # Deterministic default (framework determinism contract —
            # SURVEY.md §5 race-detection row): seed + current step, so each
            # call differs but the whole run replays bit-identically.
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.train_cfg.seed), int(state.step)
            )
        shape = shape or (self.cfg.img_dim, self.cfg.img_dim)
        labels = jnp.asarray(labels_np, jnp.int32)

        if cached:
            from vqvae_tpu.models.pixelcnn_sampler import CachedPixelCNNSampler

            @jax.jit
            def gen(params, labels, rng):
                return CachedPixelCNNSampler(self.cfg, params).generate(
                    labels, rng, shape, labels.shape[0]
                )
        else:

            @jax.jit
            def gen(params, labels, rng):
                return self.model.apply(
                    {"params": params},
                    labels,
                    rng,
                    shape,
                    labels.shape[0],
                    method=self.model.generate,
                )

        return np.asarray(gen(state.params, labels, rng))


def train_pixelcnn(
    cfg: PixelCNNConfig,
    train_cfg: TrainConfig,
    train_ds: ArrayDataset,
    val_ds: ArrayDataset,
    mesh_cfg: MeshConfig = MeshConfig(),
    verbose: bool = True,
    save_path: Optional[str] = None,
    resume: bool = False,
) -> Tuple[PixelCNNState, Dict]:
    """Best-val epoch loop (reference gated_pixelcnn.py:153-169).

    ``resume``: restore ``save_path`` (if present) and continue from the epoch
    after its tag — the prior-side resume path the reference lacks.
    ``train_cfg.gen_samples``: per-epoch sample generation (reference
    gated_pixelcnn.py:143-149 generate_samples — labels 0..9 x 10) via the
    cached AR decoder; grids are stored in the returned history.
    """
    trainer = PixelCNNTrainer(cfg, train_cfg, mesh_cfg)
    state = trainer.init_state()

    # The reference pads/crops grids to batches without resizing; batches here
    # must be uniform for jit, so the tail batch is dropped (drop_last).
    train_sampler = EpochSampler(
        len(train_ds), train_cfg.batch_size, seed=train_cfg.seed, drop_last=True,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
    )
    val_sampler = EpochSampler(
        len(val_ds), train_cfg.batch_size, seed=train_cfg.seed + 1, shuffle=False,
        drop_last=True, num_shards=jax.process_count(), shard_id=jax.process_index(),
    )

    best_loss, last_saved = float("inf"), -1
    history = {"train_loss": [], "val_loss": []}
    start_epoch = 1
    if resume and save_path and os.path.exists(save_path):
        from vqvae_tpu.train.checkpoint import check_hyperparameters_compatible

        check_hyperparameters_compatible(
            save_path, cfg.to_dict(),
            ("input_dim", "dim", "n_layers", "n_classes"),
        )
        state, saved_epoch, saved_hist, _hp = load_checkpoint(save_path, state)
        state = jax.device_put(state, trainer._rep)
        history = {k: list(v) for k, v in saved_hist.items()
                   if k in ("train_loss", "val_loss")}
        best_loss = min(history.get("val_loss") or [float("inf")])
        start_epoch, last_saved = saved_epoch + 1, saved_epoch
        # replay the samplers' RNG schedules so resumed epochs see the batches
        # an uninterrupted run would have
        for _ in range(start_epoch - 1):
            for _idx in train_sampler.epoch():
                pass
            for _idx in val_sampler.epoch():
                pass
        if verbose and jax.process_index() == 0:
            print(f"Resumed from {save_path} at epoch {saved_epoch}", flush=True)

    ckpt_writer = AsyncCheckpointer()
    epoch_samples = []
    # steps_per_dispatch > 1: stage the (tiny) grids in HBM once and run
    # scan-chunks of updates gathered on device from uploaded index arrays —
    # amortizes the fixed per-dispatch host overhead exactly like the VQ-VAE
    # loop's device-data path (chunks still end on log-interval boundaries so
    # the print cadence matches the per-step loop).
    spd = max(1, train_cfg.steps_per_dispatch)
    if spd > 1:
        trainer.stage_dataset(train_ds, val_ds)
    for epoch in range(start_epoch, train_cfg.epochs):
        if verbose:
            print(f"\nEpoch {epoch}:", flush=True)
        epoch_losses = []
        t0 = time.time()
        if spd == 1:
            for bi, idx in enumerate(train_sampler.epoch()):
                x = train_ds.data[idx]
                labels = train_ds.labels[idx]
                state, loss = trainer.step(state, x, labels)
                epoch_losses.append(loss)
                if verbose and (bi + 1) % train_cfg.log_interval == 0:
                    window = [float(v) for v in epoch_losses[-train_cfg.log_interval:]]
                    print(
                        f"\tIter [{bi + 1}] Loss: {np.mean(window):.6f} "
                        f"Time: {time.time() - t0:.2f}",
                        flush=True,
                    )
        else:
            epoch_idx = list(train_sampler.epoch())
            li = train_cfg.log_interval
            bi = 0
            while bi < len(epoch_idx):
                # chunks end ON the (bi+1) % li == 0 print boundaries
                k = min(spd, len(epoch_idx) - bi, li - bi % li)
                state, losses = trainer.steps_by_index(
                    state, np.stack(epoch_idx[bi : bi + k])
                )
                epoch_losses.extend(np.asarray(losses).tolist())
                bi += k
                if verbose and bi % li == 0:
                    window = epoch_losses[-li:]
                    print(
                        f"\tIter [{bi}] Loss: {np.mean(window):.6f} "
                        f"Time: {time.time() - t0:.2f}",
                        flush=True,
                    )
        history["train_loss"].append(float(np.mean([float(v) for v in epoch_losses])))

        val_idx = list(val_sampler.epoch())
        if spd > 1 and val_idx:
            val_losses = np.asarray(
                trainer.eval_by_index(state, np.stack(val_idx))
            ).tolist()
        else:
            val_losses = [
                float(trainer.eval_loss(state, val_ds.data[idx], val_ds.labels[idx]))
                for idx in val_idx
            ]
        cur = float(np.mean(val_losses)) if val_losses else float("inf")
        history["val_loss"].append(cur)
        if verbose:
            print(f"Validation Completed!\tLoss: {cur:.6f}", flush=True)

        if train_cfg.save or cur <= best_loss:
            best_loss, last_saved = min(cur, best_loss), epoch
            if save_path:
                ckpt_writer.save(
                    save_path, state, epoch,
                    metrics=history, hyperparameters=cfg.to_dict(),
                )
                if verbose:
                    print("Saving model!", flush=True)
        elif verbose:
            print(f"Not saving model! Last saved: {last_saved}", flush=True)

        if train_cfg.gen_samples:
            # Reference generate_samples each epoch (gated_pixelcnn.py:143-149):
            # 10 samples per class label, via the cached decoder. Kept out of
            # ``history`` (which is JSON-serialized into checkpoints).
            labels = np.repeat(np.arange(10, dtype=np.int32), 10)
            rng = jax.random.fold_in(
                jax.random.PRNGKey(train_cfg.seed + 17), epoch
            )
            grids = trainer.generate(state, labels, rng=rng)
            epoch_samples.append(grids)
            if verbose:
                print(f"Generated samples {grids.shape}", flush=True)

    ckpt_writer.wait()
    return state, {
        "history": history,
        "best_val_loss": best_loss,
        "trainer": trainer,
        "samples": epoch_samples,
    }


__all__ = ["PixelCNNTrainer", "PixelCNNState", "train_pixelcnn"]
