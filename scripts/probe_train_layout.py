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
    p.add_argument("--transpose-qkv", action="store_true",
                   help="hypothesis test: present the frozen attn "
                        "q/k/v int8 stacks to the program TRANSPOSED "
                        "((L, out, in), swapped back logically inside "
                        "the step) — if XLA's preferred layout is the "
                        "transposed one ({1,2,0} copies observed at "
                        "13B shapes), the copies must disappear")
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
    bench.setup_bench_env()  # bench serving-config env defaults (no longer an import side effect)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_train7b import build_batch

    tcfg = trainer_lib.TrainConfig(
        grad_accum_steps=1, num_train_steps=400, attn_impl="auto",
        remat=True, loss_chunk=256, optim="adamw8bit",
    )

    # shapes only — the whole state builds under eval_shape so the
    # probe allocates NOTHING on the chip (a 13B tree is ~12G HBM) and
    # is safe to run next to live benches
    def build_state():
        params = bench.synth_params(cfg, args.base)
        params = lora_lib.add_lora(
            params, jax.random.PRNGKey(1), rank=128, alpha=256.0
        )
        tr, fr, _opt, ost = trainer_lib.init_train_state(params, tcfg)
        return tr, fr, ost

    trainable, frozen, opt_state = jax.eval_shape(build_state)
    opt = trainer_lib.make_optimizer(tcfg, trainable)
    step, _ = trainer_lib.dpa_step_fns(cfg, tcfg, opt)

    QKV = ("wq", "wk", "wv")
    if args.transpose_qkv:
        base_step = step

        def swap(fz):
            fz = dict(fz)
            fz["llm"] = dict(fz["llm"])
            fz["llm"]["layers"] = dict(fz["llm"]["layers"])
            attn = dict(fz["llm"]["layers"]["attn"])
            for w in QKV:
                node = dict(attn[w])
                node["kernel_q"] = jax.numpy.swapaxes(
                    node["kernel_q"], 1, 2
                )
                attn[w] = node
            fz["llm"]["layers"]["attn"] = attn
            return fz

        def step(tr, fz, ref, ost, bt):  # noqa: F811
            return base_step(tr, swap(fz), ref, ost, bt)

        attn_s = dict(frozen["llm"]["layers"]["attn"])
        for w in QKV:
            node = dict(attn_s[w])
            kq = node["kernel_q"]
            node["kernel_q"] = jax.ShapeDtypeStruct(
                (kq.shape[0], kq.shape[2], kq.shape[1]), kq.dtype
            )
            attn_s[w] = node
        frozen = dict(frozen)
        frozen["llm"] = dict(frozen["llm"])
        frozen["llm"]["layers"] = dict(frozen["llm"]["layers"])
        frozen["llm"]["layers"]["attn"] = attn_s

    jstep = jax.jit(step, donate_argnums=(0, 3))

    batch = jax.eval_shape(
        lambda: build_batch(cfg, args.batch, args.text_len,
                            np.random.RandomState(0))
    )
    lowered = jstep.lower(trainable, frozen, None, opt_state, batch)
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
