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


def bench(batch_size: int, repeats: int = 6) -> dict:
    cfg = PixelCNNConfig()
    model = GatedPixelCNN(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((2, cfg.img_dim, cfg.img_dim), jnp.int32)
    labels2 = jnp.zeros((2,), jnp.int32)
    params = model.init(rng, dummy, labels2)["params"]
    labels = jnp.zeros((batch_size,), jnp.int32)

    naive = jax.jit(
        lambda p, l, k: model.apply(
            {"params": p}, l, k, (cfg.img_dim, cfg.img_dim), batch_size,
            method=model.generate,
        )
    )
    sampler = CachedPixelCNNSampler(cfg, params)
    cached = jax.jit(
        lambda p, l, k: CachedPixelCNNSampler(cfg, p).generate(
            l, k, (cfg.img_dim, cfg.img_dim), batch_size
        )
    )

    out = {}
    for name, fn in [("naive_full_forward", naive), ("cached_incremental", cached)]:
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
        print(name, out[name])
    speedup = (
        out["naive_full_forward"]["ms_per_batch"]
        / out["cached_incremental"]["ms_per_batch"]
    )
    print(f"cached speedup over reference-style naive: {speedup:.2f}x")
    return {"batch_size": batch_size, "speedup": speedup, **out}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_sizes", type=int, nargs="*", default=[256, 1024, 4096])
    ap.add_argument("--out", type=str, default=None,
                    help="write results to this JSON artifact (e.g. artifacts/sampler.json)")
    args = ap.parse_args()
    rows = [bench(b) for b in args.batch_sizes]
    if args.out:
        payload = {
            "metric": "8x8 grids/sec, cached incremental AR decode vs "
                      "reference-style one-full-forward-per-pixel (both jitted)",
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
