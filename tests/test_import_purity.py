"""`import bench` must be side-effect-free.

pytest imports EVERY test module at collection time, and
tests/test_synth_params.py imports bench for the synthetic-tree
helpers — so any module-level side effect in bench.py runs before the
first test of a full-suite run. Round 4's bench set
HALVA_W4A8=1 (flipping every later int4 dense trace to W4A8, whose
per-shard activation scales are a requantization — the "flaky"
manual-TP int4 token-parity failures) and pointed
jax_compilation_cache_dir at a cross-session dir of machine-specific
CPU AOT executables (scripts/repro_stale_aot.py). Both now live in
bench.setup_bench_env()/setup_bench_cache(), called only under
`if __name__ == "__main__"` (or explicitly by the measurement
scripts). This test pins the contract in a clean subprocess.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
pre_env = dict(os.environ)
sys.path.insert(0, %r)
import jax
pre_cache_dir = jax.config.jax_compilation_cache_dir
import bench  # noqa: F401
leaked = {
    k: v for k, v in os.environ.items()
    if pre_env.get(k) != v and k.startswith("HALVA_")
}
print(json.dumps({
    "env_leaks": leaked,
    "cache_dir_changed":
        jax.config.jax_compilation_cache_dir != pre_cache_dir,
}))
"""


def test_import_bench_is_pure():
    env = dict(os.environ)
    env.pop("HALVA_W4A8", None)
    env.pop("HALVA_BENCH_KV", None)
    env.pop("HALVA_SCOPED_VMEM_MB", None)
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run(
        [sys.executable, "-c", CHILD % REPO],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["env_leaks"] == {}, out
    assert not out["cache_dir_changed"], out
