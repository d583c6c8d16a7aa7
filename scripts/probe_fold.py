"""On-chip probe: the round-5 FOLDED multi-query decode kernel.

Two modes of ops/decode_attention.py:_fold_kernel face Mosaic's rules
only on real TPU (CPU tests run interpret mode):

1. beam dot-fold (HALVA_BEAM_DOT=fold, the default): all K beams of an
   item ride ONE batched dot (lhs (KVH, K*G, D)). Oracle: the beam-GRID
   kernel (HALVA_BEAM_DOT=grid) — same block sequence and merge order,
   so the only tolerated difference is dot-reduction-order rounding
   (<= ~1 bf16 ulp of the output scale).
2. speculative verify (shared_gen + causal candidates). Oracle: the XLA
   verify attention (models/llama.py:_verify_attend) on the same
   operands.

Plus the end-to-end fused verify step at 7B width (L=2 layers):
llama._verify_step_w4 (stacked-int4 matmuls + folded attention) vs the
XLA verify scan — greedy argmax must agree (speculative decode accepts
on argmax, ops/speculative.py).

Shapes: llava-7b serving (h=32, dh=128, Sp=640, Sg=128), B=4, K=4.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
os.environ.setdefault("HALVA_SCOPED_VMEM_MB", "64")
# the env knob only drives BLOCK PLANNING — the actual compile budget
# must reach libtpu before the PJRT plugin snapshots LIBTPU_INIT_ARGS
from halva_tpu.envflags import apply_tpu_env_flags  # noqa: E402

apply_tpu_env_flags()
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
if "--cpu" in sys.argv:
    # interpret-mode dry run (sitecustomize re-pins axon; env alone
    # does not stick — CLAUDE.md): validates script logic without
    # touching the relay chip's never-freed HBM
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from halva_tpu.models import llama
from halva_tpu.models.llama import _quantize_kv, _quantize_kv4
from halva_tpu.ops.decode_attention import (
    decode_attend_layer,
    fold_attend_layer,
)

rng = np.random.RandomState(0)
L, B, K, H, D, SP, SG = 2, 4, 4, 32, 128, 640, 128
BK = B * K


# --cpu dry run keeps f32 activations: XLA:CPU's DotThunk rejects
# bf16 x bf16 -> f32 dots; the real-TPU run uses serving bf16
_DT = jnp.float32 if "--cpu" in sys.argv else jnp.bfloat16


def t(*shape):
    return jnp.asarray(rng.randn(*shape), np.float32).astype(_DT)


def pc_for(mode, kp, vp):
    if mode == "int8":
        packs = [
            (_quantize_kv(kp[li]), _quantize_kv(vp[li])) for li in range(L)
        ]
        return {
            "k": jnp.stack([p[0][0] for p in packs]),
            "v": jnp.stack([p[1][0] for p in packs]),
            "k_scale": jnp.stack([p[0][1] for p in packs]),
            "v_scale": jnp.stack([p[1][1] for p in packs]),
        }
    if mode == "int4":
        packs = [
            (_quantize_kv4(kp[li]), _quantize_kv4(vp[li])) for li in range(L)
        ]
        return {
            "k4": jnp.stack([p[0][0] for p in packs]),
            "v4": jnp.stack([p[1][0] for p in packs]),
            "k_scale": jnp.stack([p[0][1] for p in packs]),
            "v_scale": jnp.stack([p[1][1] for p in packs]),
        }
    return {"k": kp, "v": vp}


# ---- part 1: beam dot-fold vs beam-grid --------------------------------
q = t(BK, 1, H, D)
kp, vp = t(L, B, H, SP, D), t(L, B, H, SP, D)
kg, vg = t(L, BK, H, SG, D), t(L, BK, H, SG, D)
seg = np.ones((B, SP), np.int32)
seg[0, 500:] = 0
seg = jnp.asarray(seg)
gv = jnp.asarray(np.arange(SG)[None, :] <= 5 + np.arange(BK)[:, None])
gen = {"k": kg, "v": vg}

for mode in ("bf16", "int8", "int4"):
    pc = pc_for(mode, kp, vp)
    for li in (0, L - 1):
        os.environ["HALVA_BEAM_DOT"] = "fold"
        got = np.asarray(
            decode_attend_layer(q, pc, seg, gen, gv, jnp.int32(li), beam_k=K),
            np.float32,
        )
        os.environ["HALVA_BEAM_DOT"] = "grid"
        want = np.asarray(
            decode_attend_layer(q, pc, seg, gen, gv, jnp.int32(li), beam_k=K),
            np.float32,
        )
        err = float(np.max(np.abs(got - want)))
        print(f"beam-fold {mode} layer {li}: max err {err:.6f}", flush=True)
        assert err <= 4e-3, (mode, li, err)  # ~1 bf16 ulp at |out|<=1
os.environ["HALVA_BEAM_DOT"] = "fold"

# ---- part 2: verify mode vs the XLA verify-attend oracle ---------------
qv = t(B, K, H, D)
kc, vc = t(B, K, H, D), t(B, K, H, D)
gen_len = jnp.asarray([0, 3, 60, 128], jnp.int32)
gvv = jnp.asarray(np.arange(SG)[None, :] < np.asarray(gen_len)[:, None])
for mode in ("bf16", "int8"):
    pc = pc_for(mode, kp, vp)
    gk8, gks8 = _quantize_kv(kg[:, :B])
    gv8, gvs8 = _quantize_kv(vg[:, :B])
    genq = {"k": gk8, "v": gv8, "k_scale": gks8, "v_scale": gvs8}
    li = 1
    got = np.asarray(
        fold_attend_layer(
            qv, pc, seg, genq, gvv, jnp.int32(li),
            fold_k=K, shared_gen=True, candidates=(kc, vc),
        ),
        np.float32,
    )
    want = np.asarray(
        jax.jit(
            lambda pcl=pc: llama._verify_attend(
                qv,
                pcl["k4" if mode == "int4" else "k"][li],
                pcl["v4" if mode == "int4" else "v"][li],
                kc, vc, seg, gk8[li], gv8[li], gen_len,
                kp_scale=pcl.get("k_scale", [None] * L)[li]
                if mode != "bf16" else None,
                vp_scale=pcl.get("v_scale", [None] * L)[li]
                if mode != "bf16" else None,
                kg_scale=gks8[li], vg_scale=gvs8[li],
            )
        )()
    , np.float32)
    err = float(np.max(np.abs(got - want)))
    print(f"verify-fold {mode}: max err {err:.6f}", flush=True)
    assert err <= 8e-3, (mode, err)

# ---- part 3: fused verify STEP at 7B width (stacked int4 tree) ---------
from halva_tpu.config import LlamaConfig
from halva_tpu.ops.w4_matmul import quantize_params_int4_host

cfg = LlamaConfig(
    vocab_size=1024, hidden_size=4096, intermediate_size=11008,
    num_layers=2, num_heads=32, max_position_embeddings=4096,
)
host = jax.tree.map(
    np.asarray,
    llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32),
)
p4 = jax.tree.map(jnp.asarray, quantize_params_int4_host(host))
b, s, kq, sg = 2, 256, 4, 128
segs = np.ones((b, s), np.int32)
segs[1, 200:] = 0
segs = jnp.asarray(segs)
pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
embeds = t(b, s, 4096)
_, pcache = jax.jit(
    lambda e: llama.prefill(
        p4, cfg, e, segs, pos, attn_impl="xla", quantize_cache="int8"
    )
)(embeds)
gcache = llama.init_gen_cache(cfg, b, sg, quantized=True)
te = t(b, kq, 4096)
pos0 = jnp.asarray([256, 200], jnp.int32)
glen = jnp.asarray([0, 2], jnp.int32)
lx, _ = jax.jit(
    lambda: llama.verify_step(
        p4, cfg, te, pos0, pcache, segs, gcache, glen, allow_fused=False
    )
)()
lf, _ = jax.jit(
    lambda: llama._verify_step_w4(
        p4, cfg, te, pos0, pcache, segs, gcache, glen
    )
)()
ax, af = np.argmax(np.asarray(lx), -1), np.argmax(np.asarray(lf), -1)
agree = float((ax == af).mean())
kl_proxy = float(np.max(np.abs(np.asarray(lx) - np.asarray(lf))))
print(f"verify-step w4: argmax agree {agree:.4f} max |dlogit| "
      f"{kl_proxy:.4f}", flush=True)
assert agree == 1.0, agree
print("FOLD PROBE OK", flush=True)
