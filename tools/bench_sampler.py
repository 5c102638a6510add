"""AR sampling benchmark: cached incremental decoder vs reference-style naive.

The reference generates with one FULL forward per pixel (64 per 8x8 grid,
reference pixelcnn/models.py:136-141) — BASELINE.md's "sampling baseline ...
the number to beat with cached decode". Both schemes here are jitted on TPU;
the naive one is the reference algorithm (fused into one fori_loop, already
far faster than the reference's Python loop), the cached one is
models/pixelcnn_sampler.py.

Timing: single jitted call per scheme (sampling is one dispatch), min over
repeats, host-transfer fenced.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.config import PixelCNNConfig
from vqvae_tpu.models.pixelcnn import GatedPixelCNN
from vqvae_tpu.models.pixelcnn_sampler import CachedPixelCNNSampler


def bench(batch_size: int, side: int = 8, repeats: int = 6,
          include_band: bool = False, include_naive: bool = True) -> dict:
    """One row at (batch_size, side x side grids). ``include_band`` adds the
    depth-limited band row refresh (models/pixelcnn_sampler.py, VERDICT r4
    item 5) as a third scheme — its vertical work is O(1) per row in H
    instead of O(H), so it pulls ahead of the whole-grid refresh once
    H > L + k0//2 + 1 (18 rows for the 15-layer reference stack)."""
    cfg = PixelCNNConfig()
    model = GatedPixelCNN(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, cfg.img_dim, cfg.img_dim), jnp.int32)
    labels2 = jnp.zeros((2,), jnp.int32)
    params = model.init(rng, dummy, labels2)["params"]
    labels = jnp.zeros((batch_size,), jnp.int32)

    naive = jax.jit(
        lambda p, l, k: model.apply(
            {"params": p}, l, k, (side, side), batch_size,
            method=model.generate,
        )
    )
    schemes = [("naive_full_forward", naive)] if include_naive else []
    refreshes = ["full", "band"] if include_band else ["full"]
    for mode in refreshes:
        schemes.append((
            f"cached_incremental_{mode}" if include_band else "cached_incremental",
            jax.jit(
                lambda p, l, k, m=mode: CachedPixelCNNSampler(
                    cfg, p, row_refresh=m
                ).generate(l, k, (side, side), batch_size)
            ),
        ))

    out = {}
    for name, fn in schemes:
        key = jax.random.PRNGKey(1)
        np.asarray(fn(params, labels, key))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(params, labels, key))
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "grids_per_sec": batch_size / best,
            "ms_per_batch": best * 1e3,
        }
        print(f"{side}x{side}", name, out[name])
    cached_best = min(
        v["ms_per_batch"] for k, v in out.items() if k.startswith("cached")
    )
    speedup = None
    if include_naive:
        speedup = out["naive_full_forward"]["ms_per_batch"] / cached_best
        print(f"cached speedup over reference-style naive: {speedup:.2f}x")
    return {"batch_size": batch_size, "side": side, "speedup": speedup, **out}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_sizes", type=int, nargs="*", default=[256, 1024, 4096])
    ap.add_argument("--side", type=int, default=8, help="grid side (H=W)")
    ap.add_argument("--band", action="store_true",
                    help="also bench the band-limited row refresh")
    ap.add_argument("--no_naive", action="store_true",
                    help="skip the naive per-pixel-full-forward baseline "
                         "(at 32x32/batch>=1024 its (B, K, H, W) logit "
                         "materialization per pixel crashes the TPU worker)")
    ap.add_argument("--out", type=str, default=None,
                    help="write results to this JSON artifact (e.g. artifacts/sampler.json)")
    args = ap.parse_args()
    rows = [
        bench(b, side=args.side, include_band=args.band,
              include_naive=not args.no_naive)
        for b in args.batch_sizes
    ]
    if args.out:
        payload = {
            "metric": f"{args.side}x{args.side} grids/sec, cached incremental "
                      "AR decode vs reference-style one-full-forward-per-pixel "
                      "(both jitted)",
            "reference_baseline": "/root/reference/pixelcnn/models.py:136-141",
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0].device_kind),
            "rows": rows,
        }
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
