"""GatedPixelCNN prior training-step throughput bench: grids/sec/chip + MFU.

The prior's training step (reference pixelcnn/gated_pixelcnn.py:78-111:
forward over the dual conv stacks, CE over (B*H*W, K), backward, Adam) is the
other half of the reference's compute; VERDICT r3 item 3 asks for its number
next to the VQ-VAE step in artifacts/train_bench.json.

Methodology (environment-validated, .claude/skills/verify/SKILL.md): serial
state dependency via lax.scan, two-point timing with interleaved min-of-9,
host-transfer fence, data generated and kept ON DEVICE.

Usage (TPU is single-tenant — run alone):
    python -u tools/bench_prior.py --out artifacts/train_bench.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPEATS = 9


def _windows(batch_size: int):
    if batch_size >= 1024:
        return 10, 60
    return 30, 180


def bench_batch(
    batch_size: int,
    compute_dtype: str = "float32",
    conv_precision: str = "highest",
) -> dict:
    import jax
    import jax.numpy as jnp

    from vqvae_tpu.config import PixelCNNConfig, TrainConfig
    from vqvae_tpu.train.pixelcnn_train import PixelCNNTrainer

    steps_lo, steps_hi = _windows(batch_size)
    # reference defaults: 15 layers, dim 64, 512 codes
    cfg = PixelCNNConfig(
        compute_dtype=compute_dtype, conv_precision=conv_precision
    )
    train_cfg = TrainConfig(batch_size=batch_size)
    trainer = PixelCNNTrainer(cfg, train_cfg)
    state = trainer.init_state()

    d = cfg.img_dim
    data = jax.jit(
        lambda key: jax.random.randint(
            key, (steps_hi, batch_size, d, d), 0, cfg.input_dim, jnp.int32
        ),
        out_shardings=trainer._multi_shard,
    )(jax.random.PRNGKey(0))
    labels = jax.jit(
        lambda key: jax.random.randint(
            key, (steps_hi, batch_size), 0, cfg.n_classes, jnp.int32
        ),
        out_shardings=trainer._multi_shard,
    )(jax.random.PRNGKey(1))
    np.asarray(data[0, 0, 0, :1])  # materialize before timing

    def run_timed(k_steps):
        nonlocal state
        t0 = time.perf_counter()
        state, losses = trainer.steps(state, data[:k_steps], labels[:k_steps])
        np.asarray(losses[-1])  # host-transfer fence
        return time.perf_counter() - t0

    run_timed(steps_lo)
    run_timed(steps_hi)
    from tools.timing import interleaved_two_point

    per_step = interleaved_two_point(run_timed, steps_lo, steps_hi, REPEATS)
    grids_per_sec = batch_size / per_step
    per_chip = grids_per_sec / jax.local_device_count()

    from vqvae_tpu.utils.flops import chip_spec, pixelcnn_train_step_flops_per_grid

    flops = pixelcnn_train_step_flops_per_grid(
        img_dim=cfg.img_dim, dim=cfg.dim, n_layers=cfg.n_layers,
        input_dim=cfg.input_dim,
    )
    spec = chip_spec(jax.devices()[0].device_kind)
    return {
        "model": "pixelcnn_prior",
        "batch_size": batch_size,
        "compute_dtype": compute_dtype,
        "conv_precision": conv_precision,
        "step_ms": per_step * 1e3,
        "grids_per_sec_per_chip": per_chip,
        "train_flops_per_grid": flops,
        "train_mfu": (per_chip * flops / spec.peak_bf16_flops) if spec else None,
        "chip": spec.name if spec else str(jax.devices()[0].device_kind),
        "backend": jax.default_backend(),
        "windows": [steps_lo, steps_hi],
        "note": (
            f"prior config at compute_dtype={compute_dtype}, "
            f"conv_precision={conv_precision} (reference trains fp32/highest); "
            "data device-resident; tiny 8x8x{64,128}-channel convs keep the "
            "bf16-peak MFU denominator far above what this shape can fill"
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 256])
    ap.add_argument("--compute_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--conv_precision", type=str, default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--out", type=str, default="artifacts/train_bench.json")
    args = ap.parse_args()

    data = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            data = json.load(f)
    rows = data.setdefault("prior_rows", [])
    data.setdefault(
        "prior_reference_workload", "/root/reference/pixelcnn/gated_pixelcnn.py:78-111"
    )
    for b in args.batches:
        r = bench_batch(b, args.compute_dtype, args.conv_precision)
        # re-measuring a config REPLACES its row (keyed on batch + precision
        # mode) — reruns must not accumulate conflicting duplicates
        key = (b, args.compute_dtype, args.conv_precision)
        rows[:] = [
            x for x in rows
            if (x.get("batch_size"), x.get("compute_dtype", "float32"),
                x.get("conv_precision", "highest")) != key
        ] + [r]
        mfu = f"{r['train_mfu']:.4f}" if r["train_mfu"] is not None else "n/a"
        print(
            f"prior batch {b:5d}: {r['step_ms']:.3f} ms/step, "
            f"{r['grids_per_sec_per_chip']:.0f} grids/s/chip, "
            f"train MFU {mfu}",
            flush=True,
        )
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:  # incremental: killed runs keep rows
            json.dump(data, f, indent=2)
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
