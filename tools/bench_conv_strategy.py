"""Serving-MFU stretch experiment (VERDICT r3 item 8): alternative lowering
for the encoder's k4/s2 convolutions.

Hypothesis: the 53% serving-MFU ceiling (ROOFLINE.md §2) comes from im2col
inefficiency of thin-channel strided convs — the first conv contracts only
kh*kw*C_in = 4*4*3 = 48 elements per output against the MXU's 128-deep
systolic dimension. A space-to-depth (2x2 block -> channels) rewrite turns
every (k=4, s=2, p=1) conv into an arithmetically identical (k=2, s=1) conv
over 4x the channels: contraction depth 48 -> 192 (conv1) / 2048 -> ...
(conv2), strictly MXU-friendlier shapes, zero extra FLOPs.

This tool checks bit-level agreement (same MACs, reassociated) and measures
both lowerings for the full encoder+quantize serving path. If the rewrite
wins, it gets wired behind a serving flag; if not, the negative result
closes item 8 in ROOFLINE §3.

Usage (TPU single-tenant — run alone):
    python -u tools/bench_conv_strategy.py --out artifacts/conv_strategy.json
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vqvae_tpu.ops.conv import _DN, _PRECISIONS, conv2d


def conv4s2_space_to_depth(x, w, b=None, precision=None):
    """(k=4, s=2, p=1) conv == space-to-depth(2) + (k=2, s=1) conv.

    x: (N, H, W, C) with H, W even; w: (4, 4, C, F); output (N, H/2, W/2, F).
    Output pixel o covers input rows 2o-1 .. 2o+2 (pad 1): after padding by 1
    on each side (H+2 even? H even -> H+2 even) and packing 2x2 blocks into
    channels, the window spans exactly 2 consecutive blocks per axis, i.e. a
    VALID (2, 2) conv over (H/2+1, W/2+1) blocks -> H/2 outputs. The kernel
    repacks as w[2bi+ri, 2bj+rj, c, f] -> wb[bi, bj, (ri, rj, c), f], matching
    the block packing's (ri, rj, c) channel order — identical MACs, so the
    result equals conv2d(..., stride=2, padding=1) up to fp reassociation.
    """
    n, h, wd, c = x.shape
    f = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, wd + 2
    xb = (
        xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hp // 2, wp // 2, 4 * c)
    )
    wb = (
        w.reshape(2, 2, 2, 2, c, f)      # (bi, ri, bj, rj, c, f)
        .transpose(0, 2, 1, 3, 4, 5)     # (bi, bj, ri, rj, c, f)
        .reshape(2, 2, 4 * c, f)
    )
    y = lax.conv_general_dilated(
        xb,
        wb.astype(xb.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=_DN,
        precision=_PRECISIONS[precision],
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def check_exact(precision="highest"):
    rng = np.random.default_rng(0)
    for c, f, hw in [(3, 64, 32), (64, 128, 16)]:
        x = jnp.asarray(rng.normal(size=(4, hw, hw, c)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(4, 4, c, f)), jnp.float32)
        ref = conv2d(x, w, stride=2, padding=1, precision=precision)
        alt = conv4s2_space_to_depth(x, w, precision=precision)
        err = float(jnp.max(jnp.abs(ref - alt)) / jnp.max(jnp.abs(ref)))
        print(f"  c={c:3d} f={f:3d} hw={hw}: max rel err {err:.2e}", flush=True)
        assert err < 1e-5, "space-to-depth rewrite is not numerically faithful"


def _measure(fn, x0, iters_lo, iters_hi, repeats=9):
    """Interleaved min-of-9 two-point timing with a serial dependency."""

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(x, iters):
        def body(z, _):
            y = fn(z)
            # serial dependency on the output, cast/truncated back to input shape
            return z + 1e-6 * y, ()

        z, _ = lax.scan(body, x, None, length=iters)
        return z

    def once(iters):
        t0 = time.perf_counter()
        np.asarray(loop(x0, iters))[0, 0, 0, 0]
        return time.perf_counter() - t0

    once(iters_lo)
    once(iters_hi)
    from tools.timing import interleaved_two_point

    return interleaved_two_point(once, iters_lo, iters_hi, repeats)


def bench(batch=256, dtype="bfloat16", iters_lo=100, iters_hi=600):
    """Measure the two k4s2 encoder convs, standard vs space-to-depth, at the
    serving config (bf16, batch 256) — the shapes behind bench.py's metric."""
    rng = np.random.default_rng(0)
    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    x = jnp.asarray(rng.normal(size=(batch, 32, 32, 3)), jdt)
    w1 = jnp.asarray(rng.normal(size=(4, 4, 3, 64)) * 0.1, jdt)
    w2 = jnp.asarray(rng.normal(size=(4, 4, 64, 128)) * 0.1, jdt)

    def std(z):
        h = jax.nn.relu(conv2d(z, w1, stride=2, padding=1))
        return jax.nn.relu(conv2d(h, w2, stride=2, padding=1))

    def s2d(z):
        h = jax.nn.relu(conv4s2_space_to_depth(z, w1))
        return jax.nn.relu(conv4s2_space_to_depth(h, w2))

    out = {}
    for name, fn in [("standard_k4s2", std), ("space_to_depth_k2s1", s2d)]:
        # output (B,8,8,128) cannot feed back into (B,32,32,3); wrap with a
        # cheap broadcast back to input shape to keep the serial dependency
        def wrapped(z, fn=fn):
            y = fn(z)
            return jnp.mean(y) * jnp.ones_like(z)

        dt = _measure(wrapped, x, iters_lo, iters_hi)
        flops = 2 * batch * (16 * 16 * 64 * 4 * 4 * 3 + 8 * 8 * 128 * 4 * 4 * 64)
        out[name] = {
            "us_per_call": dt * 1e6,
            "eff_tflops": flops / dt / 1e12,
        }
        print(f"{name:22s}: {dt*1e6:9.1f} us  ({out[name]['eff_tflops']:.2f} eff TFLOP/s)",
              flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    print("correctness (fp32/highest):", flush=True)
    check_exact()
    rows = bench(args.batch, args.dtype)
    if args.out:
        payload = {
            "experiment": "k4s2 conv lowering: standard vs space-to-depth (VERDICT r3 item 8)",
            "batch": args.batch,
            "dtype": args.dtype,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0].device_kind),
            "rows": rows,
            "speedup_s2d": rows["standard_k4s2"]["us_per_call"]
            / rows["space_to_depth_k2s1"]["us_per_call"],
        }
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
