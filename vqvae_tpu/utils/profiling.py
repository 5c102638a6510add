"""Tracing / profiling (SURVEY.md §5).

The reference's only instrumentation is wall-clock deltas printed in the
PixelCNN loop (reference pixelcnn/gated_pixelcnn.py:81,106-111). Here:

- ``profile_trace``: context manager around ``jax.profiler`` emitting
  xprof-compatible traces (for kernel roofline work).
- ``annotate``: named trace scopes visible in the profile.
- ``step_timer``: accurate per-step wall timing with host-transfer fences
  (async dispatch otherwise hides device time; ``block_until_ready`` is not
  trusted — it returns early on the tunneled TPU backend).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class step_timer:
    """Wall-clock timer with a device fence::

        with step_timer() as t:
            out = step(...)
            t.fence(out)
        print(t.seconds)
    """

    def __enter__(self):
        self._t0 = time.perf_counter()
        self.seconds: Optional[float] = None
        return self

    def fence(self, tree) -> None:
        # NOT block_until_ready: on the tunneled axon backend it can return
        # before the device finishes (verify SKILL.md gotchas), making timings
        # fiction. A host transfer of every leaf cannot return early.
        jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        return False


__all__ = ["profile_trace", "annotate", "step_timer"]
