"""Full training-step throughput bench: fwd+bwd+Adam(amsgrad), images/sec/chip.

The primary bench (bench.py) measures encode+quantize — the BASELINE.json
metric — but the reference's real workload is the complete training update
(/root/reference/main.py:67-98: forward, loss, backward, optimizer step).
This tool times OUR jitted train step end-to-end and reports images/sec/chip
and training MFU, giving later rounds a regression anchor (VERDICT r2 item 9).

Methodology (environment-validated, see .claude/skills/verify/SKILL.md):
- the step has an inherent serial dependency (state feeds the next step), so
  a lax.scan over steps cannot be dead-code-eliminated;
- two-point timing (K_hi - K_lo steps) cancels dispatch overhead;
- host-transfer fence (np.asarray of a scalar metric), never block_until_ready;
- data is generated ON DEVICE and passed through trainer.steps as a
  device-resident jax.Array. ADVICE r3 (high): the r3 run generated data on
  device but trainer.steps then pulled it host-side (np.asarray) and
  re-uploaded it INSIDE the timed window — ~630 MB of tunnel traffic per hi
  run at batch 256 timed as if it were step compute. trainer.steps now
  passes jax.Arrays through without a host round-trip and this tool asserts
  that (the r3 numbers in artifacts/train_bench.json rows tagged
  "r3_contaminated" are superseded).

Usage (TPU is single-tenant — run alone):
    python -u tools/bench_train.py --out artifacts/train_bench.json
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
    """Two-point step counts per batch size: the hi window must hold >=100 ms
    of device work, but at batch 1024 a window of 120 steps would push a
    single timed run past tunnel-safe durations (the r3 batch-1024 attempt
    was killed by a harness timeout mid-run)."""
    if batch_size >= 1024:
        return 5, 35
    if batch_size >= 256:
        return 10, 60
    return 20, 120


def bench_batch(
    batch_size: int,
    spd: int | None = None,
    conv_precision: str = "highest",
    compute_dtype: str = "float32",
    ema: bool = False,
) -> dict:
    """Measure ms/step at ``batch_size``.

    spd=None: one lax.scan dispatch covers the whole timed window — the pure
    device cost of the step with host overhead fully amortized.
    spd=k: the timed window issues ceil(K/k) separate trainer.steps dispatches
    of k steps each, fencing once at the end — exactly how the training loop
    runs with TrainConfig.steps_per_dispatch=k (metrics are only pulled at
    the log cadence), so this measures what the scan-dispatch path actually
    buys against per-step dispatch (VERDICT r3 item 5).
    """
    import jax

    from vqvae_tpu.config import TrainConfig, VQVAEConfig
    from vqvae_tpu.train.vqvae_train import VQVAETrainer

    import jax.numpy as jnp

    steps_lo, steps_hi = _windows(batch_size)
    # defaults = reference training config (fp32, highest precision); the
    # precision knobs measure the documented speed/parity tradeoff modes
    vq_cfg = VQVAEConfig(
        conv_precision=conv_precision,
        compute_dtype=compute_dtype,
        quantizer_precision=(
            "highest" if compute_dtype == "float32" else "default"
        ),
        ema_codebook=ema,
    )
    train_cfg = TrainConfig(batch_size=batch_size, steps_per_dispatch=steps_hi)
    trainer = VQVAETrainer(vq_cfg, train_cfg, x_train_var=1.0)
    state = trainer.init_state()

    # Data generated and kept ON DEVICE (see module docstring / ADVICE r3).
    data = jax.jit(
        lambda key: jax.random.normal(
            key, (steps_hi, batch_size, 32, 32, 3), jnp.float32
        ),
        out_shardings=trainer._multi_shard,
    )(jax.random.PRNGKey(0))
    assert isinstance(data, jax.Array)
    np.asarray(data[0, 0, 0, 0, :1])  # materialize before timing

    def run(state, k_steps):
        if spd is None:
            new_state, metrics = trainer.steps(state, data[:k_steps])
        else:
            for start in range(0, k_steps, spd):
                new_state, metrics = trainer.steps(
                    state, data[start : min(start + spd, k_steps)]
                )
                state = new_state
        # fence on a host transfer of a scalar metric
        np.asarray(metrics["loss"])
        return new_state

    def run_timed(k_steps):
        nonlocal state
        t0 = time.perf_counter()
        state = run(state, k_steps)
        return time.perf_counter() - t0

    # compile + warm both step counts, then interleaved min-of-REPEATS —
    # the tunnel has multi-hundred-ms latency hiccups that survive min-of-3
    # (see tools/autotune_quantizer.measure)
    run_timed(steps_lo)
    run_timed(steps_hi)
    from tools.timing import interleaved_two_point

    per_step = interleaved_two_point(run_timed, steps_lo, steps_hi, REPEATS)
    images_per_sec = batch_size / per_step
    per_chip = images_per_sec / jax.local_device_count()

    from vqvae_tpu.utils.flops import chip_spec, train_step_flops_per_image

    flops = train_step_flops_per_image()
    spec = chip_spec(jax.devices()[0].device_kind)
    return {
        "batch_size": batch_size,
        "steps_per_dispatch": spd if spd is not None else "window",
        "conv_precision": conv_precision,
        "compute_dtype": compute_dtype,
        "ema_codebook": ema,
        "step_ms": per_step * 1e3,
        "images_per_sec_per_chip": per_chip,
        "train_flops_per_image": flops,
        "train_mfu": (per_chip * flops / spec.peak_bf16_flops) if spec else None,
        "chip": spec.name if spec else str(jax.devices()[0].device_kind),
        "backend": jax.default_backend(),
        "windows": [steps_lo, steps_hi],
        "note": (
            "reference training config (fp32 params, conv_precision=highest "
            "— fp32-exact 6-pass MXU, so the bf16-peak MFU denominator "
            "understates utilization ~3x in the fp32 passes); data device-"
            "resident, passed through as jax.Array (no host transfer in the "
            "timed path)"
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 256, 1024])
    ap.add_argument(
        "--spd-batch", type=int, default=32,
        help="batch size for the steps_per_dispatch sweep",
    )
    ap.add_argument(
        "--spds", type=int, nargs="*", default=[1, 10, 50],
        help="steps_per_dispatch values to measure (empty list to skip)",
    )
    ap.add_argument("--conv_precision", type=str, default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--compute_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--ema", action="store_true",
                    help="EMA codebook updates instead of Adam codebook grads")
    ap.add_argument("--append", action="store_true",
                    help="extend the existing rows list instead of replacing "
                         "it (other artifact keys — prior_rows, provenance, "
                         "r3_contaminated_rows — are preserved either way)")
    ap.add_argument("--out", type=str, default="artifacts/train_bench.json")
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    # ALWAYS load the existing artifact: this file is shared with
    # bench_prior.py (prior_rows) and carries provenance keys the committed
    # docs cite — a fresh run must replace only its own "rows" list, never
    # destroy the rest of the file.
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    rows = existing.get("rows", []) if args.append else []

    def emit(r):
        rows.append(r)
        mfu = f"{r['train_mfu']:.4f}" if r["train_mfu"] is not None else "n/a"
        print(
            f"batch {r['batch_size']:5d} spd {r['steps_per_dispatch']!s:>6}: "
            f"{r['step_ms']:.3f} ms/step, "
            f"{r['images_per_sec_per_chip']:.0f} img/s/chip, train MFU {mfu}",
            flush=True,
        )
        # write after EVERY row — a killed run must not lose measured rows
        payload = {
            **existing,
            "metric": "vqvae_train_step_images_per_sec_per_chip (fwd+bwd+Adam)",
            "reference_workload": "/root/reference/main.py:67-98",
            "rows": rows,
        }
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)

    kw = dict(conv_precision=args.conv_precision,
              compute_dtype=args.compute_dtype, ema=args.ema)
    for b in args.batches:
        emit(bench_batch(b, **kw))
    for spd in args.spds:
        emit(bench_batch(args.spd_batch, spd=spd, **kw))
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
