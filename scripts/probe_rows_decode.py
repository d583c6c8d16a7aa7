"""On-chip probe: multi-row grid steps of the fused decode kernel.

rows > 1 packs R batch rows into each grid step (fatter DMA per step,
R x fewer steps) and requires a raised scoped-VMEM compile budget —
this script sets --xla_tpu_scoped_vmem_limit_kib itself (via
LIBTPU_INIT_ARGS, which the axon compile helper snapshots at plugin
init) and checks rows=4 and rows=2 against the rows=1 kernel at
llava-7b serving shapes. Block sizes and per-row merge order are
identical, but Mosaic schedules the unrolled multi-row body's FMAs
differently, so on REAL TPU outputs may differ by ~1 bf16 ulp (first
run measured exactly 2^-10; CPU interpret mode is exact —
tests/test_decode_attention.py::test_rows_parity_all_modes). A bug
(wrong row's scales/masks) would show O(0.1+). A scoped-VMEM compile
failure here means the flag did not reach the compiler — keep
HALVA_SCOPED_VMEM_MB unset in that case.
"""

import os
import sys

VMEM_MB = int(os.environ.get("HALVA_SCOPED_VMEM_MB", "64"))
os.environ["LIBTPU_INIT_ARGS"] = (
    os.environ.get("LIBTPU_INIT_ARGS", "")
    + f" --xla_tpu_scoped_vmem_limit_kib={VMEM_MB * 1024}"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
import numpy as np
import jax.numpy as jnp

from halva_tpu.models.llama import _quantize_kv, _quantize_kv4
from halva_tpu.ops.decode_attention import decode_attend_layer

rng = np.random.RandomState(0)
L, B, H, D, SP, SG = 2, 8, 32, 128, 640, 128


def t(*shape):
    return jnp.asarray(rng.randn(*shape), np.float32).astype(jnp.bfloat16)


q = t(B, 1, H, D)
kp, vp = t(L, B, H, SP, D), t(L, B, H, SP, D)
kg, vg = t(L, B, H, SG, D), t(L, B, H, SG, D)
seg = np.ones((B, SP), np.int32)
seg[0, 500:] = 0
seg = jnp.asarray(seg)
gv = jnp.asarray(np.arange(SG)[None, :] <= 5 + np.arange(B)[:, None])
gen = {"k": kg, "v": vg}

packs8 = [(_quantize_kv(kp[li]), _quantize_kv(vp[li])) for li in range(L)]
pc8 = {
    "k": jnp.stack([p[0][0] for p in packs8]),
    "v": jnp.stack([p[1][0] for p in packs8]),
    "k_scale": jnp.stack([p[0][1] for p in packs8]),
    "v_scale": jnp.stack([p[1][1] for p in packs8]),
}
packs4 = [(_quantize_kv4(kp[li]), _quantize_kv4(vp[li])) for li in range(L)]
pc4 = {
    "k4": jnp.stack([p[0][0] for p in packs4]),
    "v4": jnp.stack([p[1][0] for p in packs4]),
    "k_scale": jnp.stack([p[0][1] for p in packs4]),
    "v_scale": jnp.stack([p[1][1] for p in packs4]),
}

for mode, pc in (("int8", pc8), ("int4", pc4)):
    os.environ.pop("HALVA_SCOPED_VMEM_MB", None)
    base = np.asarray(
        decode_attend_layer(q, pc, seg, gen, gv, jnp.int32(1)), np.float32
    )
    for rows in (2, 4):
        os.environ["HALVA_SCOPED_VMEM_MB"] = str(VMEM_MB)
        os.environ["HALVA_DECODE_ROWS"] = str(rows)
        got = np.asarray(
            decode_attend_layer(q, pc, seg, gen, gv, jnp.int32(1)),
            np.float32,
        )
        err = float(np.max(np.abs(got - base)))
        print(f"{mode} rows={rows}: max err {err:.6f}", flush=True)
        assert err <= 2e-3, (mode, rows, err)  # ~1 bf16 ulp
os.environ.pop("HALVA_SCOPED_VMEM_MB", None)
os.environ.pop("HALVA_DECODE_ROWS", None)
print("ROWS DECODE PROBE OK", flush=True)
