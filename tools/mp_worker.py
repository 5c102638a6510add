"""Multi-process training worker: one process of an N-process virtual cluster.

Exercises the REAL multi-host code path end-to-end on plain CPUs — the same
calls a TPU pod slice makes, with gloo standing in for ICI/DCN collectives:

  - ``jax.distributed.initialize`` rendezvous (parallel/distributed.py)
  - per-process sharded sampling (data/sampler.py num_shards/shard_id)
  - ``shard_batch``'s process_count>1 branch (make_array_from_process_local_data)
  - ``steps()`` / ``steps_by_index()`` multi-process branches (vqvae_train.py)
  - multi-process state/dataset placement (parallel/mesh.py put_global)

Launched K times by tests/test_multiprocess.py (K processes x
``--local_devices`` virtual CPU devices each); process 0 writes metrics +
final params to ``--out`` for comparison against the single-process run over
the same global mesh size (bit-level agreement up to collective reduction
order).

    python tools/mp_worker.py --process_id 0 --num_processes 2 \
        --coordinator 127.0.0.1:29900 --out /tmp/mp0.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--coordinator", type=str, required=True)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n_code", type=int, default=1)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    # Force the virtual CPU platform BEFORE any backend initialization (the
    # axon TPU plugin ignores the JAX_PLATFORMS env var; config.update is
    # authoritative — same pattern as tests/conftest.py).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from vqvae_tpu.config import MeshConfig, TrainConfig, VQVAEConfig
    from vqvae_tpu.data.sampler import ReplacementSampler
    from vqvae_tpu.parallel.distributed import maybe_initialize_distributed
    from vqvae_tpu.train.vqvae_train import VQVAETrainer

    mesh_cfg = MeshConfig(
        distributed=True,
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        n_code=args.n_code,
    )
    maybe_initialize_distributed(mesh_cfg)
    assert jax.process_count() == args.num_processes, jax.process_count()
    n_devices = jax.device_count()

    # Tiny model, full training semantics (same config family as
    # __graft_entry__.dryrun_multichip).
    vq_cfg = VQVAEConfig(
        n_hiddens=16, n_residual_hiddens=8, n_embeddings=64, embedding_dim=16,
        ema_codebook=args.ema,
    )
    train_cfg = TrainConfig(batch_size=args.batch_size, seed=args.seed)
    if args.n_code > 1:
        mesh_cfg = mesh_cfg.replace(n_data=n_devices // args.n_code)
    trainer = VQVAETrainer(vq_cfg, train_cfg, mesh_cfg, x_train_var=0.06)
    state = trainer.init_state()

    # Deterministic shared dataset; every process regenerates it identically.
    data = np.random.default_rng(1).standard_normal(
        (128, 32, 32, 3)
    ).astype(np.float32)
    sampler = ReplacementSampler(
        len(data), args.batch_size, seed=args.seed,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
    )

    metrics_log = {"loss": [], "recon_error": [], "perplexity": []}

    def record(ms):
        for k in metrics_log:
            metrics_log[k].extend(float(v) for v in np.atleast_1d(np.asarray(ms[k])))

    # Mix all three dispatch paths so every multi-process branch executes:
    # singles (shard_batch), stacked batches (steps), device-resident gathers
    # (steps_by_index).
    n_single = min(2, args.steps)
    for _ in range(n_single):
        state, m = trainer.step(state, data[sampler.next_indices()])
        record(m)
    remaining = args.steps - n_single
    k1 = remaining // 2
    if k1 > 0:
        batches = np.stack([data[sampler.next_indices()] for _ in range(k1)])
        state, ms = trainer.steps(state, batches)
        record(ms)
    k2 = remaining - k1
    if k2 > 0:
        trainer.stage_dataset(data)
        idx = np.stack([sampler.next_indices() for _ in range(k2)])
        state, ms = trainer.steps_by_index(state, idx)
        record(ms)

    jax.block_until_ready(state.params)
    if args.out and jax.process_index() == 0:
        # Assemble each leaf from this process's addressable shards. Covers
        # replicated leaves (every local shard is the full value) AND the
        # row-sharded codebook leaves (n_code>1): the 2-D mesh lays the code
        # axis within a process, so process 0's shards span all K rows.
        def to_host(a):
            out = np.zeros(a.shape, a.dtype)
            for shard in a.addressable_shards:
                out[shard.index] = np.asarray(shard.data)
            return out

        params_host = jax.tree_util.tree_map(to_host, state.params)
        flat, _ = jax.tree_util.tree_flatten_with_path(params_host)
        arrays = {jax.tree_util.keystr(kp): v for kp, v in flat}
        np.savez(
            args.out,
            __step__=int(state.step),
            **{f"metric.{k}": np.asarray(v) for k, v in metrics_log.items()},
            **{f"param.{k}": v for k, v in arrays.items()},
        )
        print(f"proc 0: wrote {args.out}", flush=True)
    print(f"proc {args.process_id}: done ({args.steps} steps, "
          f"{n_devices} global devices)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
