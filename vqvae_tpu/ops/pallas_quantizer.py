"""Fused Pallas TPU kernel for the VQ bottleneck hot path.

Replaces the reference's five separate torch ops (distance expansion, argmin,
scatter one-hot, gather matmul — reference models/quantizer.py:49-60) with ONE
Pallas kernel + an XLA row gather:

  1. ``argmin`` kernel: scores = e^2 - 2 z.e per (row-tile, code-tile) on the
     MXU, with a running (best_value, best_index) carried in VMEM scratch
     across code tiles (grid dims: rows parallel, codes arbitrary/sequential).
     The (N, K) score matrix NEVER touches HBM (the plain-XLA path
     materializes it twice — write + argmin read; at the stress config
     K=8192 that is 2x64 MB of traffic per call). The per-row z^2 constant is
     dropped — it cannot change the argmin. Tie-breaking matches torch.argmin
     (first minimum): within a tile the smallest tied column wins, across
     tiles strict ``<`` keeps the earlier tile's winner.
  2. gather: ``jnp.take(codebook, idx)`` in XLA — a memory-bound row gather
     (N*D floats) that reproduces codebook rows BIT-EXACTLY at any matmul
     precision. (An earlier design gathered via one-hot @ E on the MXU inside
     a second kernel; exactness then forced precision=HIGHEST — 6-pass fp32
     MXU emulation — onto the gather, doubling the kernel cost for nothing.)

``precision`` controls only the distance matmul:
  - "highest": full-fp32 (6-pass) — bitwise argmin parity with the fp32
    reference; the default, used for training parity runs.
  - "high": bf16x3 (3-pass, ~fp32 accurate) — 2x faster distances.
  - "default": single-pass bf16 MXU — fastest; can flip near-tie
    assignments (harmless for inference/serving; the gathered z_q rows are
    still exact codebook entries).

VMEM: rows tile at 256, codes at <=512, so ~1 MB resident even at the stress
config (K=8192, D=256) while the default codebook (512x64) streams in one tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256        # legacy default; auto tiling below usually picks larger
_MAX_TILE_K = 512
# VMEM budget for auto tile selection: z tile + e tile (double-buffered) +
# the (tile_n, tile_k) score intermediate + carry scratch, in fp32 bytes.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _dot_zt_et(z, e, mode):
    """(TILE_N, D) x (TILE_K, D)^T on the MXU at the requested accuracy.

    mode "f32": full-fp32 (Mosaic lowers HIGHEST to 6 bf16 passes).
    mode "bf16": single pass; inputs arrive as bf16 (halves VMEM traffic too).
    mode "bf16x3": manual 3-pass split-product — Mosaic has no HIGH lowering,
    so decompose x.y ~= hi(x).hi(y) + hi(x).lo(y) + lo(x).hi(y), where
    hi = bf16(x) and lo = bf16(x - hi). Error ~2^-21 relative, fp32-class
    accuracy for argmin scores at half the HIGHEST cost.
    """
    dims = (((1,), (1,)), ((), ()))

    def dot(a, b, prec=jax.lax.Precision.DEFAULT):
        return jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            preferred_element_type=jnp.float32, precision=prec,
        )

    if mode == "f32":
        return dot(z, e, jax.lax.Precision.HIGHEST)
    if mode == "bf16":
        return dot(z, e)
    z_hi = z.astype(jnp.bfloat16)
    e_hi = e.astype(jnp.bfloat16)
    z_lo = (z - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    e_lo = (e - e_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(z_hi, e_hi) + dot(z_hi, e_lo) + dot(z_lo, e_hi)


def _argmin_kernel(
    z_ref, e_ref, esq_ref, idx_ref, best_val, best_idx,
    *, tile_k, n_k, mode, epilogue
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        best_val[:] = jnp.full_like(best_val, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    # (TILE_N, TILE_K) scores on the MXU: e^2 - 2 z.e
    prods = _dot_zt_et(z_ref[:], e_ref[:], mode)
    scores = esq_ref[:] - 2.0 * prods

    if epilogue == "argmin":
        # One fused min+argmin lowering (Mosaic reduce); jnp.argmin picks the
        # first minimum, matching torch tie-breaks within the tile.
        tile_min = jnp.min(scores, axis=1, keepdims=True)
        tile_arg = (
            jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None] + k * tile_k
        )
    else:  # "where": min, then first column equal to it
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


def _auto_tiles(n: int, d: int, k_codes: int) -> tuple[int, int]:
    """Pick (tile_n, tile_k) maximizing codebook reuse under the VMEM budget.

    The dominant HBM traffic is the codebook re-streamed once per ROW tile
    (n/tile_n passes of K*D words), so grow tile_n first — at the stress
    config (2048x8192x256) tile_n=1024 cuts codebook traffic 4x vs the old
    fixed 256. tile_k stays <=512: the (tile_n, tile_k) score intermediate
    is the VMEM hog and the argmin epilogue cost is O(tile_n*tile_k) either
    way. Measured sweep: tools/autotune_quantizer.py.
    """
    tile_k = min(_MAX_TILE_K, _round_up(k_codes, 128))
    tile_n = _TILE_N
    while tile_n < min(_round_up(n, 256), 2048):
        cand = tile_n * 2
        vmem = 4 * (cand * d + 2 * tile_k * d + cand * tile_k + 4 * cand)
        if vmem > _VMEM_BUDGET_BYTES:
            break
        tile_n = cand
    return tile_n, tile_k


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "precision", "tile_n", "tile_k", "epilogue"),
)
def nearest_code_pallas(
    z_flat: jnp.ndarray,
    codebook: jnp.ndarray,
    interpret: bool | None = None,
    precision: str = "highest",
    tile_n: int | None = None,
    tile_k: int | None = None,
    epilogue: str = "where",
):
    """(N, D), (K, D) -> (z_q (N, D) float32, indices (N,) int32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision not in _PRECISIONS:
        raise ValueError(f"precision must be one of {sorted(_PRECISIONS)}")
    mode = {"highest": "f32", "high": "bf16x3", "default": "bf16"}[precision]

    n, d = z_flat.shape
    k_codes = codebook.shape[0]

    auto_n, auto_k = _auto_tiles(n, d, k_codes)
    if tile_n is None:
        tile_n = auto_n
    elif tile_n % 8 != 0 or tile_n <= 0:
        # Mosaic sublane alignment; a misaligned override fails deep in
        # lowering with an obscure layout error (ADVICE r2) — fail loudly here.
        raise ValueError(f"tile_n override must be a positive multiple of 8, got {tile_n}")
    if tile_k is None:
        tile_k = auto_k
    elif tile_k % 128 != 0 or tile_k <= 0:
        # lane alignment: tile_k and the derived k_pad must be multiples of 128
        raise ValueError(
            f"tile_k override must be a positive multiple of 128, got {tile_k}"
        )
    else:
        tile_k = min(tile_k, _round_up(k_codes, 128))
    n_pad = _round_up(max(n, tile_n), tile_n)
    k_pad = _round_up(k_codes, tile_k)
    n_k = k_pad // tile_k
    n_n = n_pad // tile_n

    zf = z_flat.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    if n_pad != n:
        zf = jnp.pad(zf, ((0, n_pad - n), (0, 0)))
    e_sq = jnp.sum(cb * cb, axis=1)[None, :]  # (1, K)
    if k_pad != k_codes:
        cb_padded = jnp.pad(cb, ((0, k_pad - k_codes), (0, 0)))
        # +inf scores for padded codes so they are never selected.
        e_sq = jnp.pad(e_sq, ((0, 0), (0, k_pad - k_codes)), constant_values=jnp.inf)
    else:
        cb_padded = cb
    if mode == "bf16":
        # single-pass MXU path: ship bf16 tiles (halves VMEM traffic);
        # e_sq stays fp32 so the score epilogue keeps fp32 ordering
        zf_in, cb_in = zf.astype(jnp.bfloat16), cb_padded.astype(jnp.bfloat16)
    else:
        zf_in, cb_in = zf, cb_padded

    grid = (n_n, n_k)

    idx = pl.pallas_call(
        functools.partial(
            _argmin_kernel, tile_k=tile_k, n_k=n_k, mode=mode, epilogue=epilogue
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, d), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k), lambda i, k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k_pad * d,
            bytes_accessed=(n_pad * d + k_pad * d + n_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(zf_in, cb_in, e_sq)

    indices = idx[:n, 0]
    # Exact row gather in XLA: memory-bound, bit-identical to the codebook at
    # any distance precision (the reference gathers via one_hot @ E,
    # models/quantizer.py:60 — numerically the same rows).
    z_q = jnp.take(cb, indices, axis=0)
    return z_q.astype(z_flat.dtype), indices


__all__ = ["nearest_code_pallas"]
