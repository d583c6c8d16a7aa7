"""enable_persistent_cache: location resolution + kill switch.

The helper is what makes the second `evals/cli` / `train/run` process
skip the multi-minute remote compile (see utils/jaxcache.py docstring);
these tests pin the env contract without touching a backend.
"""

import jax

from halva_tpu.utils.jaxcache import enable_persistent_cache


def test_env_override(tmp_path, monkeypatch):
    loc = tmp_path / "jc"
    monkeypatch.setenv("HALVA_JAX_CACHE", str(loc))
    got = enable_persistent_cache()
    assert got == str(loc)
    assert loc.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(loc)


def test_off_switch(monkeypatch):
    monkeypatch.setenv("HALVA_JAX_CACHE", "off")
    assert enable_persistent_cache() is None


def test_default_under_xdg(tmp_path, monkeypatch):
    monkeypatch.delenv("HALVA_JAX_CACHE", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    got = enable_persistent_cache()
    assert got == str(tmp_path / "halva_jax")
    # idempotent
    assert enable_persistent_cache() == got
