"""60-second on-chip probe: grouped-scale W4 kernel Mosaic legality.

The grouped branch of ops/w4_matmul._w4_kernel expands (G, bnp) scale
planes to (K, bnp) with a broadcast + major-dim-merge reshape — legal in
CPU interpret mode by construction, but Mosaic relayout rules only
surface on real TPU (see CLAUDE.md). Run this before any long int4g
job: it compiles the kernel at the two 7B layer shapes and checks the
output against the XLA dequant oracle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
import numpy as np
import jax.numpy as jnp

from halva_tpu.ops.w4_matmul import (
    quantize_kernel_int4_stacked_host,
    unpack_int4,
    w4_dense_stacked,
)

B = 56
for K, N in ((4096, 11008), (11008, 4096), (4096, 4096)):
    rng = np.random.RandomState(0)
    w = rng.randn(1, K, N).astype(np.float32) * 0.02
    q = {k: jnp.asarray(v) for k, v in
         quantize_kernel_int4_stacked_host(w, group_size=128).items()}
    x = jnp.asarray(rng.randn(B, K).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    got = np.asarray(w4_dense_stacked(x, q, jnp.int32(0)), np.float32)
    lo, hi = unpack_int4(q["kernel_q4p"][0])
    s = jnp.repeat(q["kernel_scale4p"][0].astype(jnp.bfloat16),
                   K // q["kernel_scale4p"].shape[2], axis=1)
    w_deq = jnp.concatenate(
        [lo.astype(jnp.bfloat16) * s[0], hi.astype(jnp.bfloat16) * s[1]],
        axis=-1)
    want = np.asarray(jnp.dot(x, w_deq), np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print(f"K={K} N={N}: rel err {err:.5f}", flush=True)
    assert err < 0.02, err
print("W4G PROBE OK", flush=True)
