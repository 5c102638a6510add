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
}


def run(impl: str, config: str, precision: str = "highest", iters_lo=10, iters_hi=60) -> dict:
    n, k, d = CONFIGS[config]
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

    def elapsed(iters):
        out = loop(z0, cb, iters)
        np.asarray(out)  # host fence
        t0 = time.perf_counter()
        out = loop(z0, cb, iters)
        np.asarray(out)
        return time.perf_counter() - t0

    elapsed(2)  # warm both iter counts' compiles
    elapsed_lo = min(elapsed(iters_lo) for _ in range(3))
    elapsed_hi = min(elapsed(iters_hi) for _ in range(3))
    dt = (elapsed_hi - elapsed_lo) / (iters_hi - iters_lo)
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
