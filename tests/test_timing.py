"""tools/timing.py: the shared two-point timing core every bench tool uses."""

import pytest

from tools.timing import interleaved_two_point


def test_two_point_math():
    # lo runs 10 units @ 1ms + 5ms overhead; hi runs 60 units likewise
    times = {10: 0.015, 60: 0.065}
    dt = interleaved_two_point(lambda k: times[k], 10, 60, repeats=3)
    assert abs(dt - 1e-3) < 1e-12  # overhead cancels exactly


def test_retry_then_success():
    # first 2x3 interleaved samples produce a negative diff (hiccup on every
    # hi draw), second attempt is clean
    seq = iter(
        [0.05, 0.01, 0.05, 0.01, 0.05, 0.01]   # attempt 1: hi < lo -> retry
        + [0.015, 0.065, 0.015, 0.065, 0.015, 0.065]  # attempt 2: clean
    )
    dt = interleaved_two_point(lambda k: next(seq), 10, 60, repeats=3)
    assert abs(dt - 1e-3) < 1e-12


def test_raises_after_exhausted_attempts():
    with pytest.raises(RuntimeError, match="non-positive"):
        interleaved_two_point(lambda k: 0.01, 10, 60, repeats=2, attempts=2)
