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
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.config import PixelCNNConfig
from vqvae_tpu.models.pixelcnn import GatedPixelCNN
from vqvae_tpu.models.pixelcnn_sampler import CachedPixelCNNSampler


def main(batch_size: int, repeats: int = 6) -> None:
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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=256)
    args = ap.parse_args()
    main(args.batch_size)
