"""60-second on-chip probe: GQA branch of the fused decode kernel.

The grouped form reshapes (H, cols) <-> (KVH, G, cols) inside
ops/decode_attention._decode_kernel — major-dim splits/merges that are
legal in CPU interpret mode by construction but only face Mosaic's
relayout rules on real TPU (see CLAUDE.md). Run before any long GQA
serving job: compiles the kernel at Mistral-7B decode shapes (kvh=8,
h=32, dh=128) in bf16 and int8-KV modes and checks against the XLA
oracle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
import numpy as np
import jax.numpy as jnp

from halva_tpu.models.llama import _decode_attend, _quantize_kv
from halva_tpu.ops.decode_attention import decode_attend_layer

rng = np.random.RandomState(0)
L, B, H, KVH, D, SP, SG = 2, 8, 32, 8, 128, 640, 128


def t(*shape):
    return jnp.asarray(rng.randn(*shape), np.float32).astype(jnp.bfloat16)


q = t(B, 1, H, D)
kp, vp = t(L, B, KVH, SP, D), t(L, B, KVH, SP, D)
kg, vg = t(L, B, KVH, SG, D), t(L, B, KVH, SG, D)
seg = np.ones((B, SP), np.int32)
seg[0, 500:] = 0
seg = jnp.asarray(seg)
gv = jnp.asarray(np.arange(SG)[None, :] <= 5 + np.arange(B)[:, None])

for mode in ("bf16", "int8"):
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
    else:
        pc = {"k": kp, "v": vp}
    for li in (0, L - 1):
        got = np.asarray(
            decode_attend_layer(
                q, pc, seg, {"k": kg, "v": vg}, gv, jnp.int32(li)
            ),
            np.float32,
        )
        if mode == "int8":
            want = _decode_attend(
                q, pc["k"][li], pc["v"][li], kg[li], vg[li], seg, gv,
                kp_scale=pc["k_scale"][li], vp_scale=pc["v_scale"][li],
            )
        else:
            want = _decode_attend(q, kp[li], vp[li], kg[li], vg[li], seg, gv)
        err = float(np.max(np.abs(got - np.asarray(want, np.float32))))
        print(f"{mode} layer {li}: max err {err:.5f}", flush=True)
        assert err < 6e-3, err
print("GQA DECODE PROBE OK", flush=True)
