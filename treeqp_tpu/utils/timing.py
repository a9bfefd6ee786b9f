"""Timing utilities (reference treeqp/utils/timing.{h,c} + info struct).

``SolveInfo`` mirrors ``treeqp_info_t`` (tree_qp_common.h:43-51): iteration
count, status, and the total/solver/interface time split. ``min_time_over``
implements the reference measurement protocol — minimum wall time over NREP
repetitions (Makefile.rule:78-79, solve_qp_json.cpp:415-430), asserting
deterministic iteration counts across repeats.
"""

from __future__ import annotations

import dataclasses
import time

import jax

__all__ = ["SolveInfo", "Timer", "min_time_over"]


@dataclasses.dataclass
class SolveInfo:
    """Equivalent of treeqp_info_t."""

    iter: int = 0
    status: int = 0
    total_time: float = 0.0
    solver_time: float = 0.0
    interface_time: float = 0.0


class Timer:
    """tic/toc timer (treeqp_tic/toc, timing.h:31-57)."""

    def __init__(self):
        self._t0 = None

    def tic(self):
        self._t0 = time.perf_counter()
        return self

    def toc(self) -> float:
        return time.perf_counter() - self._t0


def min_time_over(fn, nrep: int = 5, check_deterministic=None):
    """Run ``fn`` nrep times, block on results, return (min_time, last_out).

    ``check_deterministic(out) -> value``: if given, asserts the extracted
    value (e.g. iteration count) is identical across repeats, as the
    reference front-end does (solve_qp_json.cpp:424-428).
    """
    best = float("inf")
    out = None
    ref_val = None
    for i in range(nrep):
        t = Timer().tic()
        out = jax.block_until_ready(fn())
        best = min(best, t.toc())
        if check_deterministic is not None:
            val = check_deterministic(out)
            if ref_val is None:
                ref_val = val
            else:
                assert val == ref_val, f"non-deterministic solve: {val} != {ref_val}"
    return best, out
