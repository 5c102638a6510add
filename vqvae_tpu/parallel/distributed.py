"""Multi-host bootstrap (new-framework-only; reference has no distributed path).

``jax.distributed.initialize`` performs the DCN rendezvous across hosts of a
TPU pod slice; afterwards ``jax.devices()`` spans all hosts and the mesh in
parallel/mesh.py covers the full slice. Safe to call in single-process runs —
it is a no-op unless MeshConfig.distributed is set.
"""

from __future__ import annotations

import jax

from vqvae_tpu.config import MeshConfig


def maybe_initialize_distributed(cfg: MeshConfig) -> None:
    if not cfg.distributed:
        return
    kwargs = {}
    if cfg.coordinator_address is not None:
        kwargs["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes is not None:
        kwargs["num_processes"] = cfg.num_processes
    if cfg.process_id is not None:
        kwargs["process_id"] = cfg.process_id
    # CPU multi-process collectives need an explicit backend; gloo ships with
    # jaxlib. Only applies when the CPU platform was explicitly forced (tests,
    # tools/mp_worker.py); on TPU pods collectives ride ICI/DCN instead.
    # (default_backend() must NOT be consulted here — it would initialize the
    # backend before the rendezvous.)
    if jax.config.jax_platforms == "cpu":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # jaxlib without this option: single-host only
    jax.distributed.initialize(**kwargs)


def is_primary_host() -> bool:
    return jax.process_index() == 0


__all__ = ["maybe_initialize_distributed", "is_primary_host"]
