"""Device mesh and sharding layout (new-framework-only; the reference is single
device — SURVEY.md §2 "Parallelism strategies in the reference: NONE").

Parallelism scheme for VQ-VAE training:
- one mesh axis ``data``: the global batch is sharded over it (P('data')),
- params (conv stacks AND the codebook) are replicated (P()),
- under ``jit`` XLA inserts the gradient all-reduce over ICI; the codebook
  gradient (a tiny K x D scatter-add per device) rides the same fused
  all-reduce and overlaps with conv backward compute via XLA's latency-hiding
  scheduler.

This module is pure layout: it never requires multiple devices — on one chip
everything degrades to trivial shardings, so the same training code runs
single-chip, multi-chip, and multi-host.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, axis_name: str = "data", devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first ``n_data``) devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is not None:
        devices = devices[:n_data]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch onto the mesh, sharded along the leading axis.

    Single-host path: one device_put of the full array. Multi-host: each host
    owns a contiguous shard (produced by the sharded sampler) and the global
    array is assembled with ``make_array_from_process_local_data``.
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(batch))


def put_global(tree, shardings):
    """Place host arrays (the full GLOBAL values, identical on every process)
    onto the mesh under per-leaf ``shardings`` (a matching pytree, or a single
    sharding applied to every leaf).

    Single-process: plain device_put. Multi-process: device_put cannot target
    non-addressable devices, so each leaf is assembled with
    ``make_array_from_callback`` — every process serves exactly the shards its
    local devices own by slicing the global host value. Used for replicated
    state, row-sharded codebook leaves, and device-staged datasets.
    """
    single = jax.process_count() == 1
    if not isinstance(shardings, NamedSharding):
        if single:
            return jax.device_put(tree, shardings)
        return jax.tree_util.tree_map(put_global, tree, shardings)
    if single:
        return jax.device_put(tree, shardings)

    def place(leaf):
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(
            arr.shape, shardings, lambda idx: arr[idx]
        )

    return jax.tree_util.tree_map(place, tree)


__all__ = [
    "make_mesh",
    "batch_sharding",
    "put_global",
    "replicated_sharding",
    "shard_batch",
]
