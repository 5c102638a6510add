"""Tracing / profiling (SURVEY.md §5).

The reference's only instrumentation is wall-clock deltas printed in the
PixelCNN loop (reference pixelcnn/gated_pixelcnn.py:81,106-111). Here:

- ``profile_trace``: context manager around ``jax.profiler`` emitting
  xprof-compatible traces (for kernel roofline work).
- ``annotate``: named trace scopes visible in the profile.
- ``step_timer``: accurate per-step wall timing with ``block_until_ready``
  fences (async dispatch otherwise hides device time).
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
        jax.block_until_ready(tree)

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        return False


__all__ = ["profile_trace", "annotate", "step_timer"]
