"""On-chip probe: sliding-window block-skip bounds in the flash kernel.

The window lower/upper block bounds (ops/flash_attention.py
_fwd_kernel kv_block_lo, _bwd_dq_kernel kv_block_lo, _bwd_dkv_kernel
num_q_blocks clamp) are dynamic fori_loop bounds computed from grid
position — logic the CPU interpret tests already pin, but Mosaic
legality and real-TPU numerics of a dynamically-bounded loop only
surface on the chip (CLAUDE.md: alignment/layout rules CPU interpret
mode never sees). Run before relying on windowed (Mistral-style)
training or serving on real hardware: compiles fwd+bwd at a shape
where the skip bounds are live (s=2048, w=512, 256-col kv blocks:
late q blocks skip >=4 kv blocks) and checks against the XLA oracle,
including a context-parallel q_offset variant.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
if os.environ.get("HALVA_PROBE_CPU"):  # interpret-mode dry run of this probe
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from halva_tpu.ops.attention import attention_reference, make_attention_mask
from halva_tpu.ops.flash_attention import flash_attention

B, S, H, D, W = 1, 2048, 4, 128, 512


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
seg = jnp.ones((B, S), jnp.int32)
ct = _rand((B, S, H, D), 3)


def loss_flash(q, k, v):
    return jnp.sum(
        flash_attention(q, k, v, seg, seg, causal=True, sliding_window=W) * ct
    )


def loss_ref(q, k, v):
    mask = make_attention_mask(seg, seg, causal=True, sliding_window=W)
    return jnp.sum(attention_reference(q, k, v, mask=mask) * ct)


# Tolerances: on real TPU the MXU rounds fp32 operands to bf16 at
# DEFAULT precision (both in the kernel and in the XLA oracle), so
# ~bf16-ulp disagreement is expected — measured 6.5e-3 fwd on v5e.
# The failure mode this probe exists for (a wrong kv_block_lo bound
# dropping a whole 256-col KV block) shifts outputs by O(0.1-1), so
# 2e-2 / 5e-2 cleanly separate "rounding" from "wrong bounds".
# (CPU interpret mode runs true fp32 and lands ~1e-5.)
FWD_TOL, BWD_TOL = (2e-2, 5e-2) if not os.environ.get("HALVA_PROBE_CPU") else (2e-3, 5e-3)

got = np.asarray(
    flash_attention(q, k, v, seg, seg, causal=True, sliding_window=W)
)
mask = make_attention_mask(seg, seg, causal=True, sliding_window=W)
want = np.asarray(attention_reference(q, k, v, mask=mask))
err = float(np.max(np.abs(got - want)))
print(f"window fwd: max err {err:.6f}", flush=True)
assert err < FWD_TOL, err

gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
for name, a, b in zip("qkv", gf, gr):
    e = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
    print(f"window d{name}: max err {e:.6f}", flush=True)
    assert e < BWD_TOL, (name, e)

# context-parallel shard: local q rows 1024..1535 at global offset
off, sq = 1024, 512
q2 = _rand((B, sq, H, D), 7)
got2 = np.asarray(
    flash_attention(
        q2, k, v, jnp.ones((B, sq), jnp.int32), seg, causal=True,
        sliding_window=W, q_offset=jnp.int32(off),
    )
)
pos_q = jnp.arange(off, off + sq)
pos_k = jnp.arange(S)
# 4D (B, 1, Sq, Skv) per attention_reference's mask contract (the
# leading axis must be batch, not rely on B=1 broadcasting)
m2 = (
    (pos_q[:, None] >= pos_k[None, :]) & (pos_q[:, None] - pos_k[None, :] < W)
)[None, None]
want2 = np.asarray(attention_reference(q2, k, v, mask=m2))
e2 = float(np.max(np.abs(got2 - want2)))
print(f"window q_offset fwd: max err {e2:.6f}", flush=True)
assert e2 < FWD_TOL, e2
print("WINDOW FLASH PROBE OK", flush=True)
