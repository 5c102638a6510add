"""Shared two-point timing core for every TPU bench tool in tools/.

The environment-validated methodology (.claude/skills/verify/SKILL.md): the
hi window must hold >=~100 ms of device work; lo/hi samples are interleaved
min-of-9 (tunnel latency hiccups survive sequential min-of-3); and a
non-positive difference is retried, then rejected — never recorded (the r3
failure mode wrote negative per-call times into an artifact).

Callers provide ``run_timed(k)`` — execute k units of work, fenced by a host
transfer, returning elapsed seconds — and get back seconds per unit.
"""

from __future__ import annotations

from typing import Callable


def interleaved_two_point(
    run_timed: Callable[[int], float],
    lo: int,
    hi: int,
    repeats: int = 9,
    attempts: int = 3,
    floor: float = 1e-8,
) -> float:
    """Seconds per work unit via interleaved min-of-``repeats`` two-point
    timing, with retry + a physical floor against tunnel hiccups.

    ``run_timed`` must already be warm (both the lo and hi variants compiled)
    before this is called.
    """
    for attempt in range(attempts):
        los, his = [], []
        for _ in range(repeats):
            los.append(run_timed(lo))
            his.append(run_timed(hi))
        dt = (min(his) - min(los)) / (hi - lo)
        if dt > floor:
            return dt
        print(
            f"  WARNING: non-physical per-unit time {dt*1e6:.2f} us "
            f"(min lo {min(los):.4f}s, min hi {min(his):.4f}s) — "
            f"retry {attempt + 1}/{attempts}",
            flush=True,
        )
    raise RuntimeError(
        "interleaved_two_point produced a non-positive per-unit time in "
        f"{attempts} attempts; tunnel too noisy — enlarge the hi window so it "
        "holds more device work"
    )


__all__ = ["interleaved_two_point"]
