"""On-chip beam-search decode benchmark (round-3 verdict item 6).

Beam decode has only ever executed on the CPU mesh (oracle parity
tests); this measures it on the real chip against greedy at the same
batch, with the shared-prompt-KV design (ops/beam.py: prompt cache
stays at B rows, beams re-STREAM those blocks K-fold but never copy
them). Reference counterpart: --num_beams in
eval_hall/model_vqa_loader.py:106-111 works in every deployment shape.

    python scripts/bench_beam.py [--batch 16] [--beams 4] [--tokens 128]
        [--weights int4] [--kv int8]

Prints one JSON line with greedy and beam tok/s at the same (batch,
tokens) point, so the K-fold prompt re-streaming cost is directly
visible as the greedy/beam ratio.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from halva_tpu.envflags import apply_tpu_env_flags

apply_tpu_env_flags()  # before jax: libtpu snapshots flags at init

os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
if os.environ.get("HALVA_BENCH_CPU"):  # CPU dry-run of this bench
    jax.config.update("jax_platforms", "cpu")
import numpy as np

import bench  # repo-root bench.py: synth_params / make_inputs / _prog
bench.setup_bench_env()  # bench serving-config env defaults (no longer an import side effect)
from halva_tpu.ops.beam import generate_beam
from halva_tpu.ops.generate import generate_greedy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="llava-v1.5-7b")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--beams", type=int, default=4)
    p.add_argument("--tokens", type=int, default=128)
    p.add_argument("--weights", default="int4", choices=["int4", "int8", "bfloat16"])
    p.add_argument("--kv", default="int8", choices=["int8", "int4", "off"])
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    os.environ["HALVA_BENCH_PRESET"] = args.preset
    cfg = bench.pick_cfg()
    kv = args.kv if args.kv != "off" else False

    bench._prog(f"building {args.weights} params ({args.preset})")
    if os.environ.get("HALVA_BENCH_CPU") and args.weights == "bfloat16":
        # this container's XLA:CPU has no bf16 dot thunk — fp32 dry-run
        import jax.numpy as jnp
        from halva_tpu.models import llava as llava_lib

        params = llava_lib.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    else:
        params = bench.synth_params(cfg, args.weights)
    np.asarray(jax.tree.leaves(params)[0][:1])  # relay fence
    bench._prog("params on device")

    ids, images, lens = (
        jax.device_put(x) for x in bench.make_inputs(cfg, args.batch)
    )

    def run(fn, name):
        bench._prog(f"{name}: compile + warmup")
        toks, _ = fn()
        np.asarray(toks)  # fence
        bench._prog(f"{name}: warm, timing")
        t0 = time.perf_counter()
        for _ in range(args.iters):
            toks, _ = fn()
            np.asarray(toks)
        dt = (time.perf_counter() - t0) / args.iters
        bench._prog(f"{name}: {dt:.3f} s/step")
        return dt

    # eos_id=-1: no early exit — both modes decode the full budget
    dt_g = run(
        lambda: generate_greedy(
            params, cfg, ids, images, lens,
            max_new_tokens=args.tokens, eos_id=-1, kv_quant=kv,
        ),
        "greedy",
    )
    dt_b = run(
        lambda: generate_beam(
            params, cfg, ids, images, lens,
            max_new_tokens=args.tokens, eos_id=-1,
            num_beams=args.beams, kv_quant=kv,
        ),
        f"beam K={args.beams}",
    )

    toks = args.batch * args.tokens
    print(json.dumps({
        "metric": "beam_decode_onchip",
        "preset": args.preset,
        "batch": args.batch,
        "num_beams": args.beams,
        "decode_tokens": args.tokens,
        "weights": args.weights,
        "kv_quant": args.kv,
        "greedy_s_per_step": round(dt_g, 3),
        "greedy_imgs_per_sec": round(args.batch / dt_g, 3),
        "greedy_tok_per_sec": round(toks / dt_g, 1),
        "beam_s_per_step": round(dt_b, 3),
        "beam_imgs_per_sec": round(args.batch / dt_b, 3),
        "beam_tok_per_sec_content": round(toks / dt_b, 1),
        "beam_vs_greedy_slowdown": round(dt_b / dt_g, 2),
        "note": (
            "same (batch, tokens) point; beam explores K hypotheses per "
            "item so its CONTENT tok/s is the per-item rate — the "
            "slowdown column is the cost of K-fold prompt-KV "
            "re-streaming plus the K-wide gen cache"
        ),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
