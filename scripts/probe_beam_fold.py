"""On-chip probe: beam-folded grid of the fused decode kernel.

beam_k > 1 reorders the kernel grid to (items, kv-blocks, beams) with
per-beam leading-dim scratch slabs (ops/decode_attention.py) so the
prompt KV streams once per item instead of once per beam. The dynamic
leading-dim scratch indexing (acc_s[bj]) and the 3D grid are legal in
CPU interpret mode by construction but only face Mosaic's rules on real
TPU (see CLAUDE.md). Oracle: the SAME kernel at beam_k=1 over a prompt
cache explicitly repeated K-fold — identical block sizes and merge
order, so outputs must match EXACTLY, isolating the grid change.

Shapes: llava-7b serving (h=32, dh=128, Sp=640, Sg=128), B=4 items,
K=4 beams, bf16 / int8 / int4-packed prompt caches.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
# this probe pins the BEAM-GRID path (its oracle is exact-match against
# the same kernel at beam_k=1); the round-5 dot-fold path has its own
# probe with a ulp tolerance (scripts/probe_fold.py)
os.environ["HALVA_BEAM_DOT"] = "grid"
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
import numpy as np
import jax.numpy as jnp

from halva_tpu.models.llama import _quantize_kv, _quantize_kv4
from halva_tpu.ops.decode_attention import decode_attend_layer

rng = np.random.RandomState(0)
L, B, K, H, D, SP, SG = 2, 4, 4, 32, 128, 640, 128
BK = B * K


def t(*shape):
    return jnp.asarray(rng.randn(*shape), np.float32).astype(jnp.bfloat16)


q = t(BK, 1, H, D)
kp, vp = t(L, B, H, SP, D), t(L, B, H, SP, D)
kg, vg = t(L, BK, H, SG, D), t(L, BK, H, SG, D)
seg = np.ones((B, SP), np.int32)
seg[0, 500:] = 0
seg = jnp.asarray(seg)
gv = jnp.asarray(np.arange(SG)[None, :] <= 5 + np.arange(BK)[:, None])
gen = {"k": kg, "v": vg}


def rep(x):  # item-row operand -> K-fold beam rows (axis 1 of (L, B, ...))
    return jnp.repeat(x, K, axis=1)


for mode in ("bf16", "int8", "int4"):
    if mode == "int8":
        packs = [
            (_quantize_kv(kp[li]), _quantize_kv(vp[li])) for li in range(L)
        ]
        pc = {
            "k": jnp.stack([p[0][0] for p in packs]),
            "v": jnp.stack([p[1][0] for p in packs]),
            "k_scale": jnp.stack([p[0][1] for p in packs]),
            "v_scale": jnp.stack([p[1][1] for p in packs]),
        }
    elif mode == "int4":
        packs = [
            (_quantize_kv4(kp[li]), _quantize_kv4(vp[li])) for li in range(L)
        ]
        pc = {
            "k4": jnp.stack([p[0][0] for p in packs]),
            "v4": jnp.stack([p[1][0] for p in packs]),
            "k_scale": jnp.stack([p[0][1] for p in packs]),
            "v_scale": jnp.stack([p[1][1] for p in packs]),
        }
    else:
        pc = {"k": kp, "v": vp}
    pc_rep = {kk: rep(vv) for kk, vv in pc.items()}
    for li in (0, L - 1):
        got = np.asarray(
            decode_attend_layer(
                q, pc, seg, gen, gv, jnp.int32(li), beam_k=K
            ),
            np.float32,
        )
        want = np.asarray(
            decode_attend_layer(
                q, pc_rep, jnp.repeat(seg, K, axis=0), gen, gv,
                jnp.int32(li), beam_k=1,
            ),
            np.float32,
        )
        err = float(np.max(np.abs(got - want)))
        print(f"{mode} layer {li}: max err {err:.6f}", flush=True)
        assert err == 0.0, (mode, li, err)
print("BEAM FOLD PROBE OK", flush=True)
