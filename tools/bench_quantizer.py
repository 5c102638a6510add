"""Quantizer kernel micro-benchmark: Pallas vs plain-XLA at default + stress configs.

Methodology per .claude/skills/verify/SKILL.md: serial data dependency inside a
jitted lax.scan (prevents DCE), two-point timing to cancel dispatch overhead,
host-transfer fence (block_until_ready is unreliable on this backend).

Usage: python -u tools/bench_quantizer.py [--impl pallas|jnp] [--config default|stress]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    # (N rows, K codes, D dim): N = batch32 x 8x8 grid
    "default": (2048, 512, 64),
    "stress": (2048, 8192, 256),
    "big_batch": (65536, 512, 64),
    "stress_big": (65536, 8192, 256),
    # mid-size codebooks pinning the Pallas/XLA crossover between the two
    # r3-measured anchors K*D = 2^15 (loss) and 2^21 (1.44x win) —
    # VERDICT r3 item 6
    "mid17": (2048, 2048, 64),    # K*D = 2^17
    "mid18": (2048, 2048, 128),   # K*D = 2^18
    "mid19": (2048, 4096, 128),   # K*D = 2^19
}


DEFAULT_ITERS = {
    # Two-point timing only cancels jitter when the hi window holds >=~100 ms
    # of device work at the fastest plausible per-call time; at micro-call
    # configs the old 10/60 default measured tunnel noise (even negative).
    "default": (2000, 12000),
    "stress": (200, 1200),
    "big_batch": (200, 1200),
    "stress_big": (30, 180),
    "mid17": (1500, 9000),
    "mid18": (800, 4800),
    "mid19": (500, 3000),
}


def run(impl: str, config: str, precision: str = "highest", iters_lo=None, iters_hi=None) -> dict:
    n, k, d = CONFIGS[config]
    if iters_lo is None:
        iters_lo = DEFAULT_ITERS[config][0]
    if iters_hi is None:
        iters_hi = DEFAULT_ITERS[config][1]
    if impl == "pallas":
        from vqvae_tpu.ops.pallas_quantizer import nearest_code_pallas as op
    else:
        from vqvae_tpu.ops.quantizer import nearest_code_jnp as op

    z0 = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    cb = jax.random.normal(jax.random.PRNGKey(1), (k, d), jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(z, cb, iters):
        def body(z, _):
            zq, idx = op(z, cb, precision=precision)
            # serial dependency: next input depends on this output
            z = z + 1e-6 * zq + 1e-9 * idx[:, None].astype(jnp.float32)
            return z, ()

        z, _ = jax.lax.scan(body, z, None, length=iters)
        return z

    def run_once(iters):
        t0 = time.perf_counter()
        np.asarray(loop(z0, cb, iters))  # host-transfer fence
        return time.perf_counter() - t0

    # warm/compile both loop variants, then min-of-9 interleaved samples:
    # the tunnel has multi-hundred-ms latency hiccups that survive min-of-3
    # (see tools/autotune_quantizer.measure)
    run_once(iters_lo)
    run_once(iters_hi)
    los, his = [], []
    for _ in range(9):
        los.append(run_once(iters_lo))
        his.append(run_once(iters_hi))
    dt = (min(his) - min(los)) / (iters_hi - iters_lo)
    flops = 2.0 * n * k * d  # distance matmul dominates
    return {
        "impl": impl,
        "precision": precision,
        "config": config,
        "rows_per_sec": n / dt,
        "us_per_call": dt * 1e6,
        "eff_tflops": flops / dt / 1e12,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas", choices=["pallas", "jnp"])
    ap.add_argument("--config", default="default", choices=sorted(CONFIGS))
    ap.add_argument("--precision", default="highest", choices=["highest", "high", "default"])
    args = ap.parse_args()
    print(run(args.impl, args.config, args.precision))
