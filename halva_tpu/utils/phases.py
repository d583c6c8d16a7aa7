"""Startup-phase wall-clock attribution for the CLI entry points.

Round-4 verdict item 3: EVAL_REAL's warm run spent ~400 s before
steady-state decode with no breakdown of where (npz tree load,
device_put over the axon relay, compile-cache restore, first-batch
warmup). Every named phase records wall seconds into a process-global
dict, logs one stderr line, and `dump()` writes the dict as JSON when
HALVA_PHASE_JSON names a path — scripts/bench_eval_real.py collects it
from the subprocess. Reference counterpart being attributed:
llava/model/builder.py:11 load + the chair.sh end-to-end walltime.

Zero overhead concerns: phases wrap multi-second host operations only.
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import contextmanager
from typing import Dict

PHASES: Dict[str, float] = {}
_T0 = time.time()


@contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        PHASES[name] = round(PHASES.get(name, 0.0) + dt, 3)
        print(
            f"[phase +{time.time() - _T0:7.1f}s] {name}: {dt:.2f}s",
            file=sys.stderr,
            flush=True,
        )


def record(name: str, seconds: float) -> None:
    PHASES[name] = round(PHASES.get(name, 0.0) + seconds, 3)


def dump() -> None:
    """Write PHASES to $HALVA_PHASE_JSON (no-op when unset)."""
    path = os.environ.get("HALVA_PHASE_JSON")
    if not path:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(PHASES, f, indent=2, sort_keys=True)
    os.replace(tmp, path)
