"""Tile-size sweep for the Pallas quantizer kernel on real TPU.

Measures nearest_code_pallas at (tile_n, tile_k) combinations against the XLA
path at each BASELINE config, using the environment-validated methodology
(serial-dependency scan, two-point timing, host-transfer fence). The winning
tiles inform _auto_tiles in ops/pallas_quantizer.py; results are recorded in
ROOFLINE.md.

Usage (TPU is single-tenant — run alone):
    python -u tools/autotune_quantizer.py --config stress --precision default
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_quantizer import CONFIGS


def measure(op, n, k, d, iters_lo=50, iters_hi=300, repeats=9) -> float:
    """Per-call seconds. Two defenses against the axon tunnel's noise floor:

    1. Window size: dispatch/fence jitter is MILLISECONDS, so the device work
       in the hi window must dwarf it (callers pass iters so that
       iters_hi x per-call >= ~100 ms — see per-config defaults in main()).
    2. min-of-9 INTERLEAVED lo/hi runs: the tunnel also has multi-hundred-ms
       latency hiccups (r3 observed a 228 ms swing that survived min-of-3 and
       produced a negative per-call time); with 9 alternating samples per
       point the chance every lo draw is clean while every hi draw is hit
       (or vice versa) is negligible, and interleaving decorrelates slow
       host/tunnel drift from the lo-vs-hi difference."""
    z0 = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    cb = jax.random.normal(jax.random.PRNGKey(1), (k, d), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(z, cb, iters):
        def body(z, _):
            zq, idx = op(z, cb)
            z = z + 1e-6 * zq + 1e-9 * idx[:, None].astype(jnp.float32)
            return z, ()

        z, _ = jax.lax.scan(body, z, None, length=iters)
        return z

    def run_once(iters):
        t0 = time.perf_counter()
        np.asarray(loop(z0, cb, iters))  # host-transfer fence
        return time.perf_counter() - t0

    # first touch compiles + warms each loop variant (compiles are minutes
    # through the tunnel — keep the compile count at exactly two)
    run_once(iters_lo)
    run_once(iters_hi)
    from tools.timing import interleaved_two_point

    return interleaved_two_point(run_once, iters_lo, iters_hi, repeats)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="stress", choices=sorted(CONFIGS))
    ap.add_argument("--precision", default="default",
                    choices=["highest", "high", "default"])
    ap.add_argument("--tile-ns", type=int, nargs="*", default=[512, 1024, 2048])
    ap.add_argument("--tile-ks", type=int, nargs="*", default=[512])
    ap.add_argument("--epilogues", type=str, nargs="*", default=["where"],
                    choices=["where", "argmin"])
    ap.add_argument("--iters-lo", type=int, default=None,
                    help="short-loop length for two-point timing; default "
                         "scales with config so the timed window >= ~100 ms")
    ap.add_argument("--iters-hi", type=int, default=None)
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--out", type=str, default=None,
                    help="append results as a JSON object keyed by "
                         "config/precision into this artifact file")
    args = ap.parse_args()

    n, k, d = CONFIGS[args.config]
    # Per-config timed-window sizes: the hi window must hold >=~100 ms of
    # device work at the FASTEST plausible per-call time (bf16 near the
    # compute bound) so the millisecond tunnel jitter cancels in the
    # two-point difference.
    default_iters = {
        "default": (2000, 12000),      # calls ~7-40 us
        "stress": (200, 1200),         # calls ~50-400 us
        "big_batch": (200, 1200),      # calls ~30-300 us
        "stress_big": (30, 180),       # calls ~1-4 ms
        "mid17": (1500, 9000),         # calls ~5-20 us
        "mid18": (800, 4800),          # calls ~10-40 us
        "mid19": (500, 3000),          # calls ~20-80 us
    }[args.config]
    iters_lo = args.iters_lo or default_iters[0]
    iters_hi = args.iters_hi or default_iters[1]
    print(f"config {args.config}: N={n} K={k} D={d}, precision={args.precision}, "
          f"iters={iters_lo}/{iters_hi}", flush=True)

    from vqvae_tpu.ops.quantizer import nearest_code_jnp
    from vqvae_tpu.ops.pallas_quantizer import nearest_code_pallas

    rows = []
    if not args.skip_xla:
        dt = measure(
            functools.partial(nearest_code_jnp, precision=args.precision),
            n, k, d, iters_lo, iters_hi,
        )
        print(f"xla: {dt*1e6:8.1f} us  ({2.0*n*k*d/dt/1e12:6.2f} eff TFLOP/s)",
              flush=True)
        rows.append({"impl": "xla", "us": dt * 1e6,
                     "eff_tflops": 2.0 * n * k * d / dt / 1e12})

    best = (None, float("inf"))
    for tn in args.tile_ns:
        if tn > 2 * n:
            continue
        for tk in args.tile_ks:
            if tk > 2 * k:
                continue
            for ep in args.epilogues:
                op = functools.partial(
                    nearest_code_pallas, precision=args.precision,
                    tile_n=tn, tile_k=tk, epilogue=ep,
                )
                try:
                    dt = measure(op, n, k, d, iters_lo, iters_hi)
                except Exception as e:
                    print(f"pallas tile_n={tn:5d} tile_k={tk:5d} {ep}: FAILED "
                          f"({type(e).__name__}: {str(e)[:120]})", flush=True)
                    continue
                print(f"pallas tile_n={tn:5d} tile_k={tk:5d} {ep:6s}: "
                      f"{dt*1e6:8.1f} us  ({2.0*n*k*d/dt/1e12:6.2f} eff TFLOP/s)",
                      flush=True)
                rows.append({"impl": "pallas", "tile_n": tn, "tile_k": tk,
                             "epilogue": ep, "us": dt * 1e6,
                             "eff_tflops": 2.0 * n * k * d / dt / 1e12})
                if dt < best[1]:
                    best = ((tn, tk, ep), dt)
    print(f"best pallas: {best[0]} {best[1]*1e6:.1f} us", flush=True)

    if args.out:
        data = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                data = json.load(f)
        key = f"{args.config}/{args.precision}"
        entry = {
            "n": n, "k": k, "d": d,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0].device_kind),
            "rows": rows,
            "best_pallas": {"tiles": best[0], "us": best[1] * 1e6}
            if best[0] else None,
        }
        xla_rows = [r for r in rows if r["impl"] == "xla"]
        if xla_rows and best[0]:
            entry["winner"] = "xla" if xla_rows[0]["us"] <= best[1] * 1e6 else "pallas"
        data[key] = entry
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(data, f, indent=2)
        print(f"wrote {args.out} [{key}]", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
