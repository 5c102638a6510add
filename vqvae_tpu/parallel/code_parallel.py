"""Codebook-parallel (sharded-codebook) quantization over a 2-D device mesh.

New-framework-only (SURVEY.md §5 "long-context / sequence parallelism" row):
the reference has nothing to shard — its codebook is 512x64 (reference
models/quantizer.py:26-27). At the BASELINE.json stress config (8192x256) the
distance matrix (N x K) dominates quantizer HBM traffic, and for much larger
codebooks a replicated codebook wastes HBM on every chip. This module blocks
the codebook over a ``code`` mesh axis, in the spirit of sequence/tensor
parallelism:

    mesh  = (data, code)
    z     : (N, D)  sharded P('data', None)   — each row group on one data slice
    cb    : (K, D)  sharded P('code', None)   — each device owns K/n_code rows

Per device (inside ``shard_map`` with explicit collectives):
    1. local distances   (N_loc x K_loc)  — one MXU matmul against the local shard
    2. local argmin      -> (local_min_val, local_idx)
    3. cross-shard combine: all_gather the (val, idx) pairs over 'code'
       (n_code x N_loc scalars — tiny), pick the winning shard with
       first-lowest-shard tie-breaking so the global index ordering matches a
       single-device ``jnp.argmin`` over the contiguous codebook exactly
    4. masked local gather + psum over 'code' reconstructs z_q rows whose
       winning code lives on another shard

The backward (custom_vjp, matching ops/quantizer.py semantics: autodiff of
``one_hot(argmin) @ codebook``) is embarrassingly shard-local: each device
scatter-adds only the cotangent rows whose winner it owns into its own
codebook shard — no collective at all in the codebook-gradient path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vqvae_tpu.ops.quantizer import QuantizeOutput


def make_2d_mesh(
    n_data: Optional[int] = None,
    n_code: int = 1,
    data_axis: str = "data",
    code_axis: str = "code",
    devices=None,
) -> Mesh:
    """(data x code) mesh. n_data=None uses all remaining devices on data."""
    if devices is None:
        devices = jax.devices()
    if n_code < 1:
        raise ValueError(f"n_code must be >= 1, got {n_code}")
    if n_data is None:
        n_data = len(devices) // n_code
    need = n_data * n_code
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_code} needs {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_code)
    return Mesh(grid, (data_axis, code_axis))


@functools.lru_cache(maxsize=None)
def _pershard_fn(code_axis: str, precision: str = "highest"):
    """Per-shard fused forward/backward, cached per (axis name, precision)."""
    from vqvae_tpu.ops.quantizer import _LAX_PRECISION

    lax_precision = _LAX_PRECISION[precision]

    def fwd_impl(z, cb):
        # z (n, D) local rows; cb (kl, D) local codebook shard.
        kl = cb.shape[0]
        # ||z - e||^2 minus the per-row z^2 constant (can't change the argmin);
        # same expansion as the reference (models/quantizer.py:49-51).
        scores = jnp.sum(cb * cb, axis=1)[None, :] - 2.0 * jnp.matmul(
            z, cb.T, precision=lax_precision
        )
        local_idx = jnp.argmin(scores, axis=1).astype(jnp.int32)  # (n,)
        local_min = jnp.take_along_axis(scores, local_idx[:, None], axis=1)[:, 0]

        # Cross-shard combine: tiny (n_code, n) gathers over the code axis.
        vals = jax.lax.all_gather(local_min, code_axis)  # (n_code, n)
        idxs = jax.lax.all_gather(local_idx, code_axis)  # (n_code, n)
        # first-lowest-shard on ties == global first-lowest-index (shards hold
        # contiguous code ranges), matching jnp.argmin tie-breaking
        win_shard = jnp.argmin(vals, axis=0).astype(jnp.int32)  # (n,)
        win_local = jnp.take_along_axis(idxs, win_shard[None, :], axis=0)[0]
        global_idx = win_shard * kl + win_local

        # Masked local gather + psum: rows whose winner lives elsewhere
        # contribute zero here and arrive via the reduction.
        my_shard = jax.lax.axis_index(code_axis).astype(jnp.int32)
        mine = win_shard == my_shard
        z_q_part = jnp.where(mine[:, None], jnp.take(cb, win_local, axis=0), 0.0)
        z_q = jax.lax.psum(z_q_part, code_axis)
        # residuals must be JAX types: cb[:, :0] is a zero-width stub carrying
        # the local shard's row count for the backward scatter-add
        return (z_q, global_idx), (win_shard, win_local, cb[:, :0])

    @jax.custom_vjp
    def pershard(z, cb):
        return fwd_impl(z, cb)[0]

    def vjp_fwd(z, cb):
        return fwd_impl(z, cb)

    def vjp_bwd(res, cts):
        win_shard, win_local, cb_stub = res
        g_zq, _g_idx = cts
        # out_specs leave 'code' unmentioned (output replicated over it); with
        # check_rep=False shard_map's transpose splits the cotangent 1/n_code
        # per shard — psum reconstitutes the full cotangent
        g_zq = jax.lax.psum(g_zq, code_axis)
        my_shard = jax.lax.axis_index(code_axis).astype(jnp.int32)
        mine = win_shard == my_shard
        g_mine = jnp.where(mine[:, None], g_zq, 0.0)
        # scatter-add of cotangent rows into this shard's codebook rows only
        d_cb = jax.ops.segment_sum(g_mine, win_local, num_segments=cb_stub.shape[0])
        return jnp.zeros_like(g_zq), d_cb.astype(cb_stub.dtype)

    pershard.defvjp(vjp_fwd, vjp_bwd)
    return pershard


def nearest_code_sharded(
    z_flat: jnp.ndarray,
    codebook: jnp.ndarray,
    mesh: Mesh,
    data_axis: str = "data",
    code_axis: str = "code",
    precision: str = "highest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded-codebook dist+argmin+gather: ((N, D), (K, D)) -> (z_q, indices).

    Bit-identical indices/z_q to ``ops.quantizer.nearest_code_jnp`` on the
    unsharded codebook (same math per distance column, same tie order).
    Differentiable like one_hot(argmin) @ codebook; d/d z_flat is zero.
    """
    n_code = mesh.shape[code_axis]
    if codebook.shape[0] % n_code != 0:
        raise ValueError(
            f"codebook rows {codebook.shape[0]} not divisible by code axis {n_code}"
        )
    if z_flat.shape[0] % mesh.shape[data_axis] != 0:
        raise ValueError(
            f"N {z_flat.shape[0]} not divisible by data axis {mesh.shape[data_axis]}"
        )
    fn = shard_map(
        _pershard_fn(code_axis, precision),
        mesh=mesh,
        in_specs=(P(data_axis, None), P(code_axis, None)),
        out_specs=(P(data_axis, None), P(data_axis)),
        check_vma=False,  # custom_vjp inside shard_map needs the vma checker off
    )
    return fn(z_flat, codebook)


def quantize_sharded(
    z: jnp.ndarray,
    codebook: jnp.ndarray,
    beta: float,
    mesh: Mesh,
    data_axis: str = "data",
    code_axis: str = "code",
    ema: bool = False,
    precision: str = "highest",
) -> QuantizeOutput:
    """Full VQ bottleneck with the codebook sharded over ``code``.

    Same contract as ops.quantizer.quantize (loss/STE/perplexity per reference
    models/quantizer.py:63-71); the loss/stat epilogue runs as ordinary jnp on
    the globally-shaped outputs and GSPMD partitions it.
    """
    b, h, w, d = z.shape
    k = codebook.shape[0]
    z_flat = z.reshape(-1, d)

    z_q_flat, idx_flat = nearest_code_sharded(
        z_flat, codebook, mesh, data_axis, code_axis, precision
    )
    z_q = z_q_flat.reshape(b, h, w, d)
    indices = idx_flat.reshape(b, h, w)

    sg = jax.lax.stop_gradient
    if ema:
        loss = beta * jnp.mean((sg(z_q) - z) ** 2)
    else:
        loss = jnp.mean((sg(z_q) - z) ** 2) + beta * jnp.mean((z_q - sg(z)) ** 2)
    z_q_ste = z + sg(z_q - z)

    counts = jnp.zeros((k,), dtype=z.dtype).at[idx_flat].add(1.0)
    e_mean = counts / idx_flat.shape[0]
    perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))

    return QuantizeOutput(
        loss=loss, z_q=z_q_ste, perplexity=perplexity, indices=indices, counts=counts
    )


def codebook_sharding(mesh: Mesh, code_axis: str = "code") -> NamedSharding:
    """Row-sharded (K, D) codebook placement."""
    return NamedSharding(mesh, P(code_axis, None))


__all__ = [
    "make_2d_mesh",
    "nearest_code_sharded",
    "quantize_sharded",
    "codebook_sharding",
]
