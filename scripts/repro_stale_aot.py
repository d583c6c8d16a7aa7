"""Deliberate reproduction of the round-4 flaky TP-int4 parity failure.

Mechanism under test: tests that invoke the CLI entry points in-process
(tests/test_cli_e2e.py) call utils/jaxcache.enable_persistent_cache(),
which points jax_compilation_cache_dir at ~/.cache/halva_jax FOR THE
REST OF THE PYTEST PROCESS. That directory persists across rounds and
fleet host reschedules, and XLA:CPU AOT executables are NOT
machine-portable (the cache key does not include host CPU features).
A later test's jit compile can then load a foreign-machine executable —
xla's cpu_aot_loader logs "Machine type used for XLA:CPU compilation
doesn't match the machine type for execution ... SIGILL" — whose
codegen (FMA/vectorization choices) rounds differently, flipping
near-tie greedy argmaxes: tests/test_generate_mesh.py's int4 parity
tests then diverge mid-sequence (observed 13-38% token mismatch).

Usage:
    python scripts/repro_stale_aot.py [cache_dir]

Runs the exact single-device int4 generate program of
test_tensor_parallel_int4_token_parity twice in SUBPROCESSES — once
with the persistent cache pointed at cache_dir (default
~/.cache/halva_jax), once with it disabled — and diffs the tokens.
Exit 0 = identical (no stale hit), exit 1 = MISMATCH (bug reproduced).
Either way it prints whether a cpu_aot_loader machine-mismatch warning
fired, which alone proves a foreign executable was loaded.
"""

import os
import subprocess
import sys

CHILD = r"""
import os, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
cache = sys.argv[1]
if cache != "off":
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.getcwd())
from halva_tpu.config import LLAVA_TINY
from halva_tpu.constants import IMAGE_TOKEN_INDEX
from halva_tpu.models import llava
from halva_tpu.ops.generate import generate
from halva_tpu.ops.w4_matmul import quantize_params_int4_host

CFG = LLAVA_TINY
params = llava.init_params(jax.random.PRNGKey(0), CFG)
pnp = jax.tree.map(np.asarray, params)
p1 = quantize_params_int4_host(pnp)
rng = np.random.RandomState(0)
b, s = 8, 24
ids = rng.randint(5, 200, (b, s)).astype(np.int32)
ids[:, 1] = IMAGE_TOKEN_INDEX
lens = np.full((b,), s, np.int32)
lens[0] = 17
lens[3] = 11
ids[6] = 0
lens[6] = 0
images = rng.randn(b, 3, CFG.vision.image_size, CFG.vision.image_size).astype(np.float32)
toks, num = generate(
    p1, CFG, ids, images, lens, 20, eos_id=2, attn_impl="xla"
)
print("TOKENS", np.asarray(toks).tolist())
"""


def run(cache: str):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run(
        [sys.executable, "-c", CHILD, cache],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    toks = None
    for line in p.stdout.splitlines():
        if line.startswith("TOKENS "):
            toks = line[len("TOKENS "):]
    mismatch_warn = "doesn't match the machine type" in p.stderr
    aot_load = "Loading XLA:CPU AOT result" in p.stderr
    return toks, aot_load, mismatch_warn, p


def main():
    cache_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.expanduser(
        "~/.cache/halva_jax"
    )
    print(f"cache dir: {cache_dir} (exists: {os.path.isdir(cache_dir)})")
    t_cache, aot, warn, p1 = run(cache_dir)
    t_fresh, _, _, p2 = run("off")
    if t_cache is None or t_fresh is None:
        print("child failed:\n", p1.stderr[-2000:], p2.stderr[-2000:])
        sys.exit(2)
    print(f"persistent-cache run: aot_load={aot} machine_mismatch_warning={warn}")
    if t_cache != t_fresh:
        print("REPRODUCED: tokens differ between cached-AOT and fresh compile")
        a, b = eval(t_cache), eval(t_fresh)
        diff = sum(x != y for ra, rb in zip(a, b) for x, y in zip(ra, rb))
        print(f"mismatched tokens: {diff}/{sum(len(r) for r in a)}")
        sys.exit(1)
    print("tokens identical (no stale-executable divergence on this host)")
    sys.exit(0)


if __name__ == "__main__":
    main()
