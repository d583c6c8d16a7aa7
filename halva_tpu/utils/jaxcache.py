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

CPU-backend caveat: XLA:CPU AOT executables are compiled for the HOST
CPU's exact feature set, and jax's cache key does NOT include host CPU
features — an entry written on one fleet machine loads on another with
only a cpu_aot_loader warning ("Machine type used for XLA:CPU
compilation doesn't match...") and subtly different FMA/vectorization
rounding. That skew flipped near-tie greedy argmaxes in the round-4
manual-TP parity tests (scripts/repro_stale_aot.py documents the
mechanism). When the configured platform is CPU, the cache dir is
therefore scoped by a host-CPU fingerprint; TPU executables target the
chip, not the host, and keep the shared location.

The jax master switch is respected: if jax_enable_compilation_cache is
False (tests/conftest.py pins it off for the suite), this helper is a
no-op.

Override the location with HALVA_JAX_CACHE; disable with
HALVA_JAX_CACHE=off (e.g. when diagnosing stale-executable layout bugs —
see the boundary-Format landmine in CLAUDE.md).
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpu_fingerprint() -> str:
    """Stable per-host-CPU tag: machine arch + ISA feature flags."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(
        f"{platform.machine()}|{feats}".encode()
    ).hexdigest()[:12]
    return f"cpu-{h}"


def _platform_is_cpu() -> bool:
    """Best-effort platform resolution WITHOUT initializing a backend:
    jax.config.jax_platforms if set (tests pin "cpu"), else
    JAX_PLATFORMS (sitecustomize pins "axon" in this image)."""
    try:
        import jax

        cfg = jax.config.jax_platforms
    except Exception:
        cfg = None
    plats = cfg or os.environ.get("JAX_PLATFORMS", "")
    first = plats.split(",")[0].strip().lower()
    return first == "cpu"


def enable_persistent_cache() -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Returns the cache dir, or None when disabled/unavailable. Safe to
    call more than once and before jax initializes a backend.
    """
    loc = os.environ.get("HALVA_JAX_CACHE", "")
    if loc.lower() == "off":
        return None
    try:
        import jax

        if not jax.config.jax_enable_compilation_cache:
            return None
    except Exception:
        return None
    if not loc:
        loc = os.path.join(
            os.environ.get("XDG_CACHE_HOME")
            or os.path.join(os.path.expanduser("~"), ".cache"),
            "halva_jax",
        )
    if _platform_is_cpu():
        # CPU AOT results are host-specific; never share across machines
        loc = os.path.join(loc, _cpu_fingerprint())
    try:
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        # never cache trivially-recompilable programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        return None
    return loc
