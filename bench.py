"""Benchmark: CIFAR-10 encode+quantize images/sec/chip (the BASELINE.json primary metric).

Methodology (validated on this environment — see .claude/skills/verify/SKILL.md):
- The per-invocation host<->device overhead here is ~28 ms, so the workload runs
  as a jitted lax.scan with a SERIAL data dependency between iterations (the
  next input depends on the previous output) — without the dependency XLA
  dead-code-eliminates every iteration but the last and the "throughput"
  becomes fiction.
- Two-point timing: elapsed(ITERS_HI) - elapsed(ITERS_LO) isolates pure device
  time for (ITERS_HI - ITERS_LO) iterations, cancelling the fixed dispatch
  overhead exactly.
- Encoder convs run in bfloat16 (MXU native; production inference config),
  the quantizer stays fp32 (code assignment keeps reference precision).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the baseline
is the reference's own torch implementation on this machine's CPU, PINNED in
`artifacts/torch_cpu_baseline.json` (measured once by tools/pin_torch_baseline.py
with methodology recorded). A live measurement on a loaded 2-core host swung
vs_baseline 1398 -> 849 between rounds on identical code (VERDICT r2 weak-item
6); the pinned constant makes the ratio a property of the code, not of host
load. Prints exactly ONE JSON line; the serving-precision point
(quantizer_precision="default") rides along as `serving_*` fields.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = 1024
ITERS_LO = 20
ITERS_HI = 120
WARMUP = 2
TIMED_REPEATS = 3

BASELINE_PIN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "artifacts", "torch_cpu_baseline.json"
)
# Fallback when the pin artifact is missing (fresh checkout without artifacts):
# torch-CPU reference encode+quantize throughput measured on this host.
RECORDED_TORCH_CPU_IMAGES_PER_SEC = 330.0


def _torch_baseline() -> float:
    """Pinned torch-CPU reference throughput (tools/pin_torch_baseline.py)."""
    try:
        with open(BASELINE_PIN) as f:
            return float(json.load(f)["images_per_sec"])
    except Exception:
        return RECORDED_TORCH_CPU_IMAGES_PER_SEC


def _bench_config(cfg) -> float:
    """images/sec/chip of jitted encode+quantize at the given VQVAEConfig."""
    import jax
    import jax.numpy as jnp

    from vqvae_tpu.models.vqvae import VQVAE

    model = VQVAE(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 32, 32, 3), jnp.float32)
    params = model.init(rng, x[:1])["params"]

    def encode_quantize(params, x):
        z_e = model.apply({"params": params}, x, method=model.encode)
        return model.apply({"params": params}, z_e, method=model.quantize).indices

    def make_loop(iters: int):
        @jax.jit
        def loop(params, x):
            def body(carry, _):
                xc, acc = carry
                idx = encode_quantize(params, xc)
                # serial dependency: next input depends on this output, so no
                # iteration can be elided or reordered away
                bump = (idx.sum().astype(jnp.float32) % 7.0) * jnp.float32(1e-9)
                return (xc + bump, acc + idx.sum()), None

            (_, acc), _ = jax.lax.scan(
                body, (x, jnp.int32(0)), None, length=iters
            )
            return acc

        return loop

    def timed(loop):
        # Fence with a host transfer of the scalar result: block_until_ready
        # returns early on this backend (verified), np.asarray cannot.
        for _ in range(WARMUP):
            np.asarray(loop(params, x))
        best = float("inf")
        for _ in range(TIMED_REPEATS):
            t0 = time.perf_counter()
            np.asarray(loop(params, x))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(make_loop(ITERS_LO))
    t_hi = timed(make_loop(ITERS_HI))
    per_iter = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    return BATCH / per_iter / jax.local_device_count()


def main() -> int:
    import jax

    from vqvae_tpu.config import VQVAEConfig

    # Primary point: production inference config with reference-exact code
    # assignment (fp32-HIGHEST distance matmul — bitwise argmin parity).
    per_chip = _bench_config(VQVAEConfig(compute_dtype="bfloat16"))
    # Serving point: quantizer distances on the MXU in single-pass bf16
    # (near-tie code assignments may flip; fine for serving — see ROOFLINE.md).
    serving_per_chip = _bench_config(
        VQVAEConfig(compute_dtype="bfloat16", quantizer_precision="default")
    )

    baseline = _torch_baseline()

    # MFU: analytic encode+quantize FLOPs/image x achieved rate over the chip's
    # dense bf16 peak (the honest denominator — the torch-CPU vs_baseline ratio
    # is flattering but uninformative; VERDICT r1 weak-item 8). See ROOFLINE.md
    # for the full bytes/FLOPs analysis.
    from vqvae_tpu.utils.flops import chip_spec, encode_quantize_flops_per_image

    flops_per_image = encode_quantize_flops_per_image()
    spec = chip_spec(jax.devices()[0].device_kind)

    def mfu(rate):
        return (
            round(rate * flops_per_image / spec.peak_bf16_flops, 4)
            if spec is not None
            else None
        )

    out = {
        "metric": "cifar10_encode_quantize_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / baseline, 2),
        "mfu": mfu(per_chip),
        "serving_value": round(serving_per_chip, 1),
        "serving_mfu": mfu(serving_per_chip),
        "baseline_pinned": os.path.exists(BASELINE_PIN),
        "flops_per_image": flops_per_image,
        "chip": spec.name if spec is not None else jax.devices()[0].device_kind,
    }
    # Ride-along: the committed full-training-step numbers (fwd+bwd+Adam,
    # tools/bench_train.py — NOT re-measured here, quoted from the artifact
    # of record so the driver's BENCH snapshot carries the training story).
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts", "train_bench.json")
        ) as f:
            rows = json.load(f)["rows"]
        ref = [
            r for r in rows
            if r["batch_size"] == 256 and r.get("steps_per_dispatch") == "window"
            and r.get("conv_precision", "highest") == "highest"
            and not r.get("ema_codebook")  # algorithm variant, benched apart
        ]
        # Same row filter as `ref` (ADVICE r4): a future --append run at
        # another batch/spd must not be silently quoted under the b256 key.
        fast = [
            r for r in rows
            if r.get("compute_dtype") == "bfloat16"
            and r["batch_size"] == 256 and r.get("steps_per_dispatch") == "window"
            and not r.get("ema_codebook")
        ]
        if ref:
            out["train_images_per_sec_per_chip_b256"] = round(
                ref[-1]["images_per_sec_per_chip"], 1
            )
            out["train_mfu_b256"] = round(ref[-1]["train_mfu"], 4)
        if fast:
            out["train_bf16_images_per_sec_per_chip_b256"] = round(
                fast[-1]["images_per_sec_per_chip"], 1
            )
        out["train_source"] = "artifacts/train_bench.json (committed measurement)"
    except Exception:
        pass
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
