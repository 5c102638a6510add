"""Fused Pallas TPU kernels for the VQ bottleneck hot path.

Replaces the reference's five separate torch ops (distance expansion, argmin,
scatter one-hot, gather matmul — reference models/quantizer.py:49-60) with two
Pallas kernels that keep the z tile resident in VMEM and stream codebook tiles:

  1. ``argmin`` kernel: scores = e^2 - 2 z.e per (row-tile, code-tile) on the
     MXU, with a running (best_value, best_index) carried in VMEM scratch
     across code tiles (grid dims: rows parallel, codes arbitrary/sequential).
     The per-row z^2 constant is dropped — it cannot change the argmin.
     Tie-breaking matches torch.argmin (first minimum) because within a tile
     the smallest tied column index wins and across tiles strict ``<`` keeps
     the earlier tile's winner.
  2. ``gather`` kernel: z_q = one_hot(idx) @ E accumulated over code tiles on
     the MXU — the same math as the reference's ``min_encodings @ weight``
     (models/quantizer.py:60) but tiled and fused, never materializing the
     (N, K) one-hot in HBM.

Both kernels tile rows at 256 and codes at <=512, so VMEM stays ~1 MB even at
the stress config (K=8192, D=256) while the full default codebook (512x64)
streams in a single tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256
_MAX_TILE_K = 512


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# Kernel 1: tiled argmin over codebook
# ---------------------------------------------------------------------------


def _argmin_kernel(z_ref, e_ref, esq_ref, idx_ref, best_val, best_idx, *, tile_k, n_k):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        best_val[:] = jnp.full_like(best_val, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    # (TILE_N, TILE_K) scores on the MXU: e^2 - 2 z.e
    # precision=HIGHEST: full-fp32 multiply (the MXU's default bf16-input
    # rounding could flip near-tie argmins vs the fp32 reference).
    prods = jax.lax.dot_general(
        z_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = esq_ref[:] - 2.0 * prods

    tile_min = jnp.min(scores, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    big = jnp.int32(2**30)
    tile_arg = jnp.min(
        jnp.where(scores == tile_min, col, big), axis=1, keepdims=True
    ) + k * tile_k

    upd = tile_min < best_val[:]
    best_val[:] = jnp.where(upd, tile_min, best_val[:])
    best_idx[:] = jnp.where(upd, tile_arg, best_idx[:])

    @pl.when(k == n_k - 1)
    def _():
        idx_ref[:] = best_idx[:]


# ---------------------------------------------------------------------------
# Kernel 2: tiled one-hot gather
# ---------------------------------------------------------------------------


def _gather_kernel(idx_ref, e_ref, zq_ref, *, tile_k):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        zq_ref[:] = jnp.zeros_like(zq_ref)

    local = idx_ref[:] - k * tile_k  # (TILE_N, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (idx_ref.shape[0], tile_k), 1)
    onehot = (col == local).astype(jnp.float32)
    # precision=HIGHEST makes the one-hot gather EXACT: selecting a single row
    # of E must reproduce the codebook entry bit-for-bit (torch gather parity);
    # default MXU precision would round E to bf16.
    zq_ref[:] += jax.lax.dot_general(
        onehot,
        e_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_code_pallas(z_flat: jnp.ndarray, codebook: jnp.ndarray, interpret: bool | None = None):
    """(N, D), (K, D) -> (z_q (N, D) float32, indices (N,) int32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n, d = z_flat.shape
    k_codes = codebook.shape[0]

    tile_k = min(_MAX_TILE_K, _round_up(k_codes, 128))
    n_pad = _round_up(max(n, _TILE_N), _TILE_N)
    k_pad = _round_up(k_codes, tile_k)
    n_k = k_pad // tile_k
    n_n = n_pad // _TILE_N

    zf = z_flat.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    if n_pad != n:
        zf = jnp.pad(zf, ((0, n_pad - n), (0, 0)))
    e_sq = jnp.sum(cb * cb, axis=1)[None, :]  # (1, K)
    if k_pad != k_codes:
        cb = jnp.pad(cb, ((0, k_pad - k_codes), (0, 0)))
        # +inf scores for padded codes so they are never selected.
        e_sq = jnp.pad(e_sq, ((0, 0), (0, k_pad - k_codes)), constant_values=jnp.inf)

    grid = (n_n, n_k)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
    )

    idx = pl.pallas_call(
        functools.partial(_argmin_kernel, tile_k=tile_k, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, d), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, d), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k), lambda i, k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_N, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_TILE_N, 1), jnp.float32),
            pltpu.VMEM((_TILE_N, 1), jnp.int32),
        ],
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k_pad * d,
            bytes_accessed=(n_pad * d + k_pad * d + n_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(zf, cb, e_sq)

    z_q = pl.pallas_call(
        functools.partial(_gather_kernel, tile_k=tile_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, d), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_N, d), lambda i, k: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k_pad * d,
            bytes_accessed=(n_pad * d + k_pad * d + n_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, cb)

    return z_q[:n].astype(z_flat.dtype), idx[:n, 0]


__all__ = ["nearest_code_pallas"]
