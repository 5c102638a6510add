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


def measure(op, n, k, d, iters_lo=50, iters_hi=300) -> float:
    """Per-call seconds. High iteration counts: on this 2-core host the
    dispatch/fence jitter is milliseconds, so the device work in the timed
    window must dwarf it (300 calls x ~100 us = 30 ms >> jitter)."""
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

    def elapsed(iters):
        np.asarray(loop(z0, cb, iters))
        t0 = time.perf_counter()
        np.asarray(loop(z0, cb, iters))
        return time.perf_counter() - t0

    # the first call inside elapsed() compiles + warms; no separate warm pass
    # (tunnel compiles are minutes each — keep the compile count minimal)
    lo = min(elapsed(iters_lo) for _ in range(3))
    hi = min(elapsed(iters_hi) for _ in range(3))
    return (hi - lo) / (iters_hi - iters_lo)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="stress", choices=sorted(CONFIGS))
    ap.add_argument("--precision", default="default",
                    choices=["highest", "high", "default"])
    ap.add_argument("--tile-ns", type=int, nargs="*", default=[512, 1024, 2048])
    ap.add_argument("--tile-ks", type=int, nargs="*", default=[512])
    ap.add_argument("--epilogues", type=str, nargs="*", default=["where"],
                    choices=["where", "argmin"])
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--out", type=str, default=None,
                    help="append results as a JSON object keyed by "
                         "config/precision into this artifact file")
    args = ap.parse_args()

    n, k, d = CONFIGS[args.config]
    print(f"config {args.config}: N={n} K={k} D={d}, precision={args.precision}",
          flush=True)

    from vqvae_tpu.ops.quantizer import nearest_code_jnp
    from vqvae_tpu.ops.pallas_quantizer import nearest_code_pallas

    rows = []
    if not args.skip_xla:
        dt = measure(
            functools.partial(nearest_code_jnp, precision=args.precision), n, k, d
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
                    dt = measure(op, n, k, d)
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
