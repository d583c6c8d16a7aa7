"""7B prefill logits ON CPU for a quant_quality mode — the chip-vs-host
cross-check.

    python scripts/qq_cpu_probe.py bf16
    python scripts/qq_cpu_probe.py int4
    python scripts/qq_cpu_probe.py --compare

Runs the SAME trees/inputs as scripts/quant_quality.py (first 2 prompts,
prefill only — a 7B decode loop is impractical on one CPU) and saves
f32 logits. --compare correlates the CPU logits against the on-chip
npz artifacts: high chip-vs-CPU corr for a mode whose chip-vs-bf16 corr
is LOW proves the degradation is the quantizer itself (identical on
both backends), not a TPU-specific numeric defect. Also prints the
CPU-side bf16-vs-mode corr — if CPU reproduces the chip's decorrelation
the expansive-random-net explanation (quant_quality docstring) holds.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

import quant_quality as qq
from halva_tpu.config import LLAVA_V15_7B
from halva_tpu.ops import generate as gen_mod

N = 2  # prompts (7B prefill on one CPU core is minutes per row)


def run(mode: str):
    cfg = LLAVA_V15_7B
    host = qq.host_bf16_tree(cfg)
    ids, images, lens = qq.make_inputs(cfg)
    tree = host if mode == "bf16" else qq.quantize_mode(host, mode)
    params = jax.tree.map(jnp.asarray, tree)
    del host, tree
    ft, fl, _, _, _ = gen_mod._prefill_phase(
        params, cfg, jnp.asarray(ids[:N]), jnp.asarray(images[:N]),
        jnp.asarray(lens[:N]), 8, "xla", True,
    )
    out = os.path.join(qq.OUT_DIR, f"cpu_{mode}_logits.npy")
    np.save(out, np.asarray(fl, np.float32))
    print(f"{mode}: first tokens {np.asarray(ft)}, logits -> {out}")


def compare():
    def corr(a, b):
        return float(np.mean([
            np.corrcoef(a[r], b[r])[0, 1] for r in range(a.shape[0])
        ]))

    cpu = {}
    for mode in ("bf16", "int8", "int4", "int4g", "nf4"):
        p = os.path.join(qq.OUT_DIR, f"cpu_{mode}_logits.npy")
        if os.path.exists(p):
            cpu[mode] = np.load(p)
    for mode, lg in cpu.items():
        row = [f"cpu_{mode}"]
        if "bf16" in cpu and mode != "bf16":
            row.append(f"vs cpu_bf16 corr={corr(lg, cpu['bf16'][:N]):.4f}")
        chip_p = os.path.join(qq.OUT_DIR, f"{mode}.npz")
        if os.path.exists(chip_p):
            chip = np.load(chip_p)["logits"][:N]
            row.append(f"vs CHIP {mode} corr={corr(lg, chip):.4f}")
        print("  ".join(row))


if __name__ == "__main__":
    if "--compare" in sys.argv:
        compare()
    else:
        run(sys.argv[1])
