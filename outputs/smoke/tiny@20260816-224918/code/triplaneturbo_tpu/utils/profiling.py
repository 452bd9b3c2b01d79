"""Profiling hooks: jax.profiler traces + per-phase step timing.

The reference has only import timing + tqdm (SURVEY §5.1); here a proper
tracing story: wrap any phase in :func:`phase_timer`, or enable a
`jax.profiler` trace with TTT_PROFILE_DIR=/path (view with TensorBoard or
xprof). launch.py honors the env var around the train loop.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

_PHASE_TOTALS: Dict[str, float] = defaultdict(float)
_PHASE_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase_timer(name: str):
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        _PHASE_TOTALS[name] += dt
        _PHASE_COUNTS[name] += 1


def phase_report() -> Dict[str, Dict[str, float]]:
    return {
        k: {"total_s": round(v, 3), "count": _PHASE_COUNTS[k], "mean_ms": round(1000 * v / max(_PHASE_COUNTS[k], 1), 2)}
        for k, v in _PHASE_TOTALS.items()
    }


@contextlib.contextmanager
def maybe_trace(step: int, start: int = 5, num: int = 3):
    """Trace steps [start, start+num) when TTT_PROFILE_DIR is set."""
    d = os.environ.get("TTT_PROFILE_DIR")
    if d and start <= step < start + num:
        with jax.profiler.trace(d):
            yield
    else:
        yield
