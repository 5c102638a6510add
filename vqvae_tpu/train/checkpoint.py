"""Checkpoint save/restore.

The reference saves ``{'model': state_dict, 'results': metrics, 'hyperparameters':
args}`` via torch.save every log_interval (reference utils.py:106-115,
main.py:86-93) and only ever loads in the notebook. Here the same contract —
params + optimizer state + step + metric history + configs — round-trips
through a single atomic .npz (flattened pytree leaves) + JSON metadata, with a
resume path the reference lacks:

- atomic: write to a temp file then rename, so a crash never corrupts the
  latest checkpoint (failure-recovery — SURVEY.md §5).
- multi-host: only process 0 writes (state is replicated); every host can read.
- ``latest_checkpoint`` + step-tagged filenames give resume-from-latest.
- format v2: leaves are saved under their pytree KEY PATHS (not positions) and
  restored by name with shape AND dtype checks, so two configs whose trees
  happen to have the same leaf count/shapes can never silently cross-load.
  v1 (positional ``leaf_{i}``) checkpoints are still readable.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

FORMAT_VERSION = 2
_LEAF_PREFIX = "leaf::"


def _flatten_state(state) -> Dict[str, np.ndarray]:
    flat, _treedef = jax.tree_util.tree_flatten_with_path(state)
    arrays = {}
    for kp, leaf in flat:
        key = _LEAF_PREFIX + jax.tree_util.keystr(kp)
        if key in arrays:
            raise ValueError(f"duplicate checkpoint key path {key!r}")
        arrays[key] = np.asarray(leaf)
    return arrays


def save_checkpoint(
    path: str,
    state,
    step: int,
    metrics: Optional[Dict] = None,
    hyperparameters: Optional[Dict] = None,
) -> str:
    """Save a pytree ``state`` (params/opt_state/...) with metadata, atomically."""
    if jax.process_index() != 0:
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = _flatten_state(state)
    meta = {
        "format_version": FORMAT_VERSION,
        "step": int(step),
        "metrics": metrics or {},
        "hyperparameters": hyperparameters or {},
        "n_leaves": len(arrays),
    }
    dirname = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez(tmp, __meta__=json.dumps(meta), **arrays)
        # np.savez appends .npz when missing; mkstemp name already ends in .npz
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


def load_checkpoint(path: str, state_template) -> Tuple[Any, int, Dict, Dict]:
    """Restore into the structure of ``state_template``.

    Format v2: leaves matched BY KEY PATH with shape + dtype validation —
    a checkpoint from a different config/tree fails loudly, never cross-loads.
    Format v1 (positional): legacy fallback, shape-checked only.

    Returns (state, step, metrics, hyperparameters).
    """
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        version = int(meta.get("format_version", 1))
        flat_t, treedef = jax.tree_util.tree_flatten_with_path(state_template)

        if version >= 2:
            saved_keys = {k for k in data.files if k.startswith(_LEAF_PREFIX)}
            want_keys = {
                _LEAF_PREFIX + jax.tree_util.keystr(kp) for kp, _ in flat_t
            }
            if saved_keys != want_keys:
                missing = sorted(want_keys - saved_keys)[:5]
                extra = sorted(saved_keys - want_keys)[:5]
                raise ValueError(
                    f"checkpoint tree mismatch: missing leaves {missing}, "
                    f"unexpected leaves {extra}"
                )
            leaves = []
            for kp, tmpl in flat_t:
                key = _LEAF_PREFIX + jax.tree_util.keystr(kp)
                saved = np.asarray(data[key])
                if hasattr(tmpl, "shape") and tuple(saved.shape) != tuple(tmpl.shape):
                    raise ValueError(
                        f"{key}: checkpoint shape {saved.shape} != template "
                        f"{tuple(tmpl.shape)}"
                    )
                if hasattr(tmpl, "dtype") and saved.dtype != np.dtype(tmpl.dtype):
                    raise ValueError(
                        f"{key}: checkpoint dtype {saved.dtype} != template "
                        f"{np.dtype(tmpl.dtype)}"
                    )
                leaves.append(saved)
        else:  # v1 positional fallback (kept for one round)
            n = meta["n_leaves"]
            if n != len(flat_t):
                raise ValueError(
                    f"checkpoint has {n} leaves, template has {len(flat_t)}"
                )
            leaves = [np.asarray(data[f"leaf_{i}"]) for i in range(n)]
            for i, (saved, (_kp, tmpl)) in enumerate(zip(leaves, flat_t)):
                if hasattr(tmpl, "shape") and tuple(saved.shape) != tuple(tmpl.shape):
                    raise ValueError(
                        f"leaf {i}: checkpoint shape {saved.shape} != template "
                        f"{tuple(tmpl.shape)}"
                    )
        state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, meta["step"], meta.get("metrics", {}), meta.get("hyperparameters", {})


def peek_hyperparameters(path: str) -> Dict:
    """Read a checkpoint's stored hyperparameters WITHOUT a state template.

    The reference contract (visualization.ipynb cell 1 ``load_model``):
    rebuild the model from what the checkpoint says it is, never from
    whatever flags the loading process happens to have — otherwise any
    non-default architecture/mode (e.g. ``ema_codebook``, whose EMA stats
    live in the state tree) fails the strict v2 tree match or silently
    cross-loads."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
    return meta.get("hyperparameters", {}) or {}


def check_hyperparameters_compatible(
    path: str, current: Dict, fields: Tuple[str, ...]
) -> None:
    """Fail FAST with the real cause when resuming with mismatched flags.

    The strict v2 tree match already refuses wrong-architecture loads, but
    its error ('unexpected leaves ...') does not say WHY. Before a resume
    load, compare the tree-affecting ``fields`` of the current config
    against the checkpoint's stored hyperparameters and raise an actionable
    message naming each mismatch. Legacy checkpoints (no stored
    hyperparameters) are skipped."""
    hp = peek_hyperparameters(path)
    if not hp:
        return
    mismatched = {
        k: (hp[k], current[k])
        for k in fields
        if k in hp and k in current and hp[k] != current[k]
    }
    if mismatched:
        detail = ", ".join(
            f"{k}: checkpoint={s!r} vs flags={c!r}"
            for k, (s, c) in sorted(mismatched.items())
        )
        raise ValueError(
            f"cannot resume {path!r} with mismatched model flags ({detail}); "
            "pass flags matching the checkpoint (its full config is stored "
            "in the file's hyperparameters metadata)"
        )


class AsyncCheckpointer:
    """Orbax-style async checkpointing (SURVEY.md §5 failure-recovery row).

    ``save`` snapshots the state to host memory (device-to-host copy — this
    must be synchronous: the train loop donates state buffers, so the device
    arrays are deleted by the next step) and hands the NumPy tree to a single
    background writer thread that does the serialization + atomic
    temp-file+rename off the critical path — the train loop never blocks on
    disk. One in-flight save at a time (a new save waits for the previous
    write, like orbax's AsyncCheckpointer); call ``wait()`` before
    exit/restore.
    """

    def __init__(self):
        import threading

        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(
        self,
        path: str,
        state,
        step: int,
        metrics: Optional[Dict] = None,
        hyperparameters: Optional[Dict] = None,
    ) -> str:
        import threading

        if jax.process_index() != 0:
            return path
        self.wait()
        # D2H snapshot BEFORE the next donated step deletes these buffers
        host_state = jax.tree_util.tree_map(np.asarray, state)

        def _write():
            try:
                save_checkpoint(path, host_state, step, metrics, hyperparameters)
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name=f"ckpt-writer-step{step}", daemon=True
        )
        self._thread.start()
        return path

    def wait(self) -> None:
        """Block until the in-flight save (if any) is durable; re-raise its error."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


_CKPT_RE = re.compile(r"_step(\d+)\.npz$")


def checkpoint_path(results_dir: str, name: str, step: int) -> str:
    return os.path.join(results_dir, f"vqvae_{name}_step{step}.npz")


def latest_checkpoint(results_dir: str, name: str) -> Optional[str]:
    """Newest step-tagged checkpoint for ``name``, or None."""
    if not os.path.isdir(results_dir):
        return None
    best, best_step = None, -1
    prefix = f"vqvae_{name}_step"
    for fn in os.listdir(results_dir):
        if not fn.startswith(prefix):
            continue
        m = _CKPT_RE.search(fn)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(results_dir, fn)
    return best


__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "checkpoint_path",
    "AsyncCheckpointer",
]
