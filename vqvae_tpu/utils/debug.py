"""Debug-mode numerical checks (SURVEY.md §5 "race detection / sanitizers").

JAX is functional, so data races are designed out; the sanitizer analogue here
is NaN/Inf detection and index-bounds checking via ``jax.experimental.checkify``
plus global nan-debugging. Determinism (same seed => bit-identical step) is
covered by tests/test_train.py::test_determinism_same_seed.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def enable_nan_checks(enable: bool = True) -> None:
    """Global NaN debugging: every jit computation re-runs un-jitted and raises
    on the first NaN it produces. Expensive — debug only."""
    jax.config.update("jax_debug_nans", enable)


def checked(fn: Callable, *, errors=checkify.float_checks) -> Callable:
    """Wrap ``fn`` with checkify NaN/Inf (and optionally OOB-index) checks.

    Returns a function with the same signature whose first return value is the
    checkify error; call ``err.throw()`` on host to surface failures::

        step = checked(train_step)
        err, (state, metrics) = jax.jit(step)(state, batch)
        err.throw()
    """
    return checkify.checkify(fn, errors=errors)


__all__ = ["enable_nan_checks", "checked"]
