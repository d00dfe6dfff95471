"""Per-member wall-clock capture for the packed suite carriers.

The expensive suites (the streaming-drain carriers, g3456 engine waves)
run their members concurrently, so the suite's single bench number can
mask a real member regression behind startup noise (VERDICT r4 #6).
Each suite records the wall seconds of every member's build/drain call
here; bench.py folds the dict of its LAST run into the JSON line as
``members``.

Thread-safety: members run inside a ThreadPoolExecutor, but each
member writes a distinct key of a pre-created dict — safe under the
GIL. Times are per-member call latency under that concurrency, i.e.
they include scheduler contention exactly as independent jobs on a
shared cluster would.
"""

from __future__ import annotations

import time
from typing import Callable

#: suite name -> {member -> wall seconds of its build/drain call},
#: overwritten on every suite invocation
MEMBER_SECONDS: dict[str, dict[str, float]] = {}


def timed_member(suite: str, member: str, fn: Callable, *args):
    """Run ``fn(*args)`` recording its wall time under
    MEMBER_SECONDS[suite][member]; returns fn's result. The suite's
    dict must be reset via ``reset(suite)`` before submitting."""
    t0 = time.perf_counter()
    out = fn(*args)
    MEMBER_SECONDS[suite][member] = round(time.perf_counter() - t0, 3)
    return out


def reset(suite: str) -> dict[str, float]:
    d: dict[str, float] = {}
    MEMBER_SECONDS[suite] = d
    return d
