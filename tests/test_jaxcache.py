"""enable_persistent_cache: location resolution, the master kill
switches, and the per-host-CPU fingerprint scoping.

The helper is what makes the second `evals/cli` / `train/run` process
skip the multi-minute remote compile (utils/jaxcache.py docstring).
Two hard requirements pinned here (round-4 flaky-parity root cause,
scripts/repro_stale_aot.py):
- the suite runs with jax_enable_compilation_cache=False (conftest),
  and the helper must honor that master switch — an in-process CLI
  call (tests/test_cli_e2e.py) must NOT re-point later tests at a
  cross-session cache of machine-specific CPU AOT executables;
- when it IS enabled on a CPU platform, the dir must be scoped by a
  host-CPU fingerprint so a fleet reschedule can never serve an
  executable compiled for another machine's ISA.
"""

import jax

from halva_tpu.utils.jaxcache import (
    _cpu_fingerprint,
    enable_persistent_cache,
)


def test_suite_runs_with_compilation_cache_disabled():
    # the conftest contract the whole suite's hermeticity rests on
    assert jax.config.jax_enable_compilation_cache is False


def test_noop_under_disabled_master_switch(tmp_path, monkeypatch):
    monkeypatch.setenv("HALVA_JAX_CACHE", str(tmp_path / "jc"))
    before = jax.config.jax_compilation_cache_dir
    assert enable_persistent_cache() is None
    assert jax.config.jax_compilation_cache_dir == before


def _with_cache_enabled(fn):
    old = jax.config.jax_enable_compilation_cache
    old_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_enable_compilation_cache", True)
    try:
        return fn()
    finally:
        jax.config.update("jax_enable_compilation_cache", old)
        jax.config.update("jax_compilation_cache_dir", old_dir)


def test_env_override_fingerprinted_on_cpu(tmp_path, monkeypatch):
    loc = tmp_path / "jc"
    monkeypatch.setenv("HALVA_JAX_CACHE", str(loc))

    got = _with_cache_enabled(enable_persistent_cache)
    # conftest pins jax_platforms=cpu -> per-host-CPU subdir
    fp = _cpu_fingerprint()
    assert got == str(loc / fp)
    assert (loc / fp).is_dir()
    assert fp.startswith("cpu-") and len(fp) == 16


def test_off_switch(monkeypatch):
    monkeypatch.setenv("HALVA_JAX_CACHE", "off")
    assert _with_cache_enabled(enable_persistent_cache) is None


def test_default_under_xdg(tmp_path, monkeypatch):
    monkeypatch.delenv("HALVA_JAX_CACHE", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    got = _with_cache_enabled(enable_persistent_cache)
    assert got == str(tmp_path / "halva_jax" / _cpu_fingerprint())
    # idempotent
    assert _with_cache_enabled(enable_persistent_cache) == got


def test_fingerprint_stable():
    assert _cpu_fingerprint() == _cpu_fingerprint()
