"""Persistent XLA compilation cache for the CLI entry points.

On this class of deployment (remote-compile TPU relays in particular) a
7B-scale generate/train program costs minutes to compile; the reference
amortizes nothing because torch re-traces eagerly, but under jit the
compiled executable is fully reusable across processes. Every halva_tpu
entry point (train/run, train/vila, evals/cli, scripts/chat) calls
enable_persistent_cache() before first backend use, so the second and
later invocations of the same config skip straight to execution.

Measured on the v5e relay (scripts/bench_eval_real.py): the 7B CHAIR
eval's decode phase dropped from ~540 s (recompile every run) to the
steady-state loop alone once the cache was enabled.

Override the location with HALVA_JAX_CACHE; disable with
HALVA_JAX_CACHE=off (e.g. when diagnosing stale-executable layout bugs —
see the boundary-Format landmine in CLAUDE.md).
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Returns the cache dir, or None when disabled/unavailable. Safe to
    call more than once and before jax initializes a backend.
    """
    loc = os.environ.get("HALVA_JAX_CACHE", "")
    if loc.lower() == "off":
        return None
    if not loc:
        loc = os.path.join(
            os.environ.get("XDG_CACHE_HOME")
            or os.path.join(os.path.expanduser("~"), ".cache"),
            "halva_jax",
        )
    try:
        os.makedirs(loc, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        # never cache trivially-recompilable programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        return None
    return loc
