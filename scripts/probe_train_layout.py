"""Diagnose the XLA relayout copies of frozen quantized weight stacks
in the DPA train step (STATUS.md "Open": ~1.5G at 7B, 3G at 13B —
the int8-base 13B single-chip blocker).

Compiles (does NOT execute — safe next to running chip jobs) a 2-layer
7B-width train step for the TPU backend, prints the executable's memory
analysis, and scans the optimized HLO for `copy`/`transpose` ops on
int8 operands — identifying WHICH weight stacks XLA re-lays-out and to
what layout, so the fix can store them in that orientation up front.

    python scripts/probe_train_layout.py [--base int8|int4] [--layers 2]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
if os.environ.get("HALVA_BENCH_CPU"):  # script smoke-test off-chip
    jax.config.update("jax_platforms", "cpu")
import numpy as np

from halva_tpu.config import LlamaConfig, LlavaConfig, ViTConfig
from halva_tpu.ops import quant as quant_lib
from halva_tpu.train import lora as lora_lib
from halva_tpu.train import trainer as trainer_lib


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="int8", choices=["int8", "int4"])
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--hidden", type=int, default=4096)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--text-len", type=int, default=512)
    p.add_argument("--hlo-out", default="/tmp/train_layout_hlo.txt",
                   help="full optimized HLO dump path")
    args = p.parse_args()

    cfg = LlavaConfig(
        llm=LlamaConfig(
            vocab_size=32000, hidden_size=args.hidden,
            intermediate_size=11008 * args.hidden // 4096,
            num_layers=args.layers, num_heads=args.hidden // 128,
            max_position_embeddings=4096,
        ),
        vision=ViTConfig(
            image_size=336, patch_size=14, hidden_size=1024,
            intermediate_size=4096, num_layers=2, num_heads=16,
        ),
    )
    quant_lib.set_w8a8(False)

    import bench

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_train7b import build_batch

    params = bench.synth_params(cfg, args.base)
    params = lora_lib.add_lora(
        params, jax.random.PRNGKey(1), rank=128, alpha=256.0
    )
    tcfg = trainer_lib.TrainConfig(
        grad_accum_steps=1, num_train_steps=400, attn_impl="auto",
        remat=True, loss_chunk=256, optim="adamw8bit",
    )
    trainable, frozen, opt, opt_state = trainer_lib.init_train_state(
        params, tcfg
    )
    step, _ = trainer_lib.dpa_step_fns(cfg, tcfg, opt)
    step = jax.jit(step, donate_argnums=(0, 3))

    batch = build_batch(cfg, args.batch, args.text_len,
                        np.random.RandomState(0))
    lowered = step.lower(trainable, frozen, None, opt_state, batch)
    compiled = lowered.compile()

    ma = compiled.memory_analysis()
    print(f"argument bytes: {ma.argument_size_in_bytes/2**30:.3f} G")
    print(f"output bytes:   {ma.output_size_in_bytes/2**30:.3f} G")
    print(f"temp bytes:     {ma.temp_size_in_bytes/2**30:.3f} G")
    print(f"alias bytes:    {ma.alias_size_in_bytes/2**30:.3f} G")

    hlo = compiled.as_text()
    with open(args.hlo_out, "w") as f:
        f.write(hlo)
    print(f"optimized HLO -> {args.hlo_out} ({len(hlo)/1e6:.1f} MB)")

    # big int8 ops that change layout: copies/transposes/bitcasts whose
    # operand is an s8 tensor with >= 2 * hidden^2 elements
    thresh = 2 * args.hidden * args.hidden
    pat = re.compile(r"s8\[([0-9,]+)\][^ ]*")
    interesting = []
    for line in hlo.splitlines():
        ls = line.strip()
        if not re.search(r"= s8\[|copy|transpose", ls):
            continue
        if " = " not in ls:
            continue
        rhs = ls.split(" = ", 1)[1].split("(", 1)[0].split()
        opcode = rhs[-1] if rhs else ""
        if not any(k in opcode for k in ("copy", "transpose", "bitcast")):
            continue
        m = pat.search(ls)
        if not m:
            continue
        n = 1
        for d in m.group(1).split(","):
            n *= int(d)
        if n >= thresh:
            interesting.append(ls[:240])
    print(f"\nbig s8 copy/transpose ops: {len(interesting)}")
    for ls in interesting[:40]:
        print("  " + ls)

    # entry parameter layouts for the frozen int8/int4 stacks
    print("\nentry layouts of s8 params >= thresh:")
    for line in hlo.splitlines():
        ls = line.strip()
        if "parameter(" not in ls or "s8[" not in ls:
            continue
        m = pat.search(ls)
        if not m:
            continue
        n = 1
        for d in m.group(1).split(","):
            n *= int(d)
        if n >= thresh:
            print("  " + ls[:240])


if __name__ == "__main__":
    main()
