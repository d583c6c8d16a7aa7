"""Continuous batching vs bucketed drain on an EOS-exit variable-length
workload (round-4 verdict item 5's "Done" measurement).

Workload: N requests whose per-row token budgets follow a CHAIR-like
caption-length distribution (lognormal, clipped [24, cap]; real CHAIR
captions run ~30-150 tokens around a ~100 mean — reference budget
semantics: <=1024 new tokens with EOS exit,
eval_hall/model_vqa_loader.py:102-111). Budgets stand in for EOS exits:
random-weight models never emit a real EOS, and a row hitting its
budget frees its slot exactly as an EOS row would.

- drain baseline = the one-shot program's semantics on this workload:
  each batch of B rows decodes until its LONGEST row finishes. We time
  full-budget batches (max-of-batch ~= cap for B>=40 draws) — exactly
  what EVAL_HOSTIO measured for the bucketed runner.
- continuous = ops/continuous.ContinuousEngine (chunked decode +
  EOS-freed slot refill), same token budgets, timed end to end
  including its refill prefills and host sync.

    python scripts/bench_continuous.py [--batch 80] [--requests 240]
        [--cap 128] [--chunk 16]

Prints one JSON line; the queue lands it as BENCH_CONTINUOUS.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (synthetic serving trees; import is side-effect-free)

bench.setup_bench_env()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from halva_tpu.constants import IMAGE_TOKEN_INDEX  # noqa: E402
from halva_tpu.ops.continuous import ContinuousEngine, Request  # noqa: E402
from halva_tpu.ops.generate import generate  # noqa: E402


def _prog(msg):
    print(f"[cb +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


def chair_like_budgets(n, cap, seed=3):
    rng = np.random.RandomState(seed)
    b = np.exp(rng.normal(np.log(95.0), 0.35, n))
    return np.clip(b.round().astype(np.int32), 24, cap)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--requests", type=int, default=240)
    ap.add_argument("--cap", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--weights", default=os.environ.get(
        "HALVA_BENCH_WEIGHTS", "int4"))
    ap.add_argument("--cpu", action="store_true",
                    help="pin the cpu backend (smoke runs; env "
                         "JAX_PLATFORMS does not stick on this image — "
                         "sitecustomize re-pins axon)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_compilation_cache", False)

    cfg = bench.pick_cfg()  # HALVA_BENCH_PRESET (llava-v1.5-7b default)
    kv_mode = os.environ.get("HALVA_BENCH_KV", "int4")
    kv_quant = kv_mode if kv_mode in ("int8", "int4") else False

    _prog(f"building synthetic {args.weights} tree on device")
    params = bench.synth_params(cfg, args.weights)

    budgets = chair_like_budgets(args.requests, args.cap)
    rng = np.random.RandomState(0)
    prompt_len = 48
    ids = rng.randint(5, 30000, (args.requests, prompt_len)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    images = rng.randn(
        args.requests, 3, cfg.vision.image_size, cfg.vision.image_size
    ).astype(np.float32)

    # ---- continuous ----
    eng = ContinuousEngine(
        params, cfg, batch=args.batch, max_new_tokens=args.cap,
        eos_id=-1, prompt_pad=prompt_len, chunk=args.chunk,
        kv_quant=kv_quant, attn_impl="auto",
    )
    reqs = [
        Request(ids=ids[i], image=images[i], budget=int(budgets[i]))
        for i in range(args.requests)
    ]
    _prog("continuous: warmup (compile chunk + prefill programs)")
    warm = eng.run(reqs[: args.batch])
    assert all(r is not None for r in warm)
    _prog("continuous: timed run")
    t0 = time.time()
    out = eng.run(reqs)
    # engine.run returns after final host readback — already fenced
    cont_wall = time.time() - t0
    total_tokens = int(sum(n for _, n in out))
    cont = {
        "wall_s": round(cont_wall, 2),
        "imgs_per_sec": round(args.requests / cont_wall, 3),
        "tokens_per_sec": round(total_tokens / cont_wall, 1),
        "lockstep_steps": eng.stats["steps"],
        "chunks": eng.stats["chunks"],
        "refills": eng.stats["refills"],
    }
    _prog(f"continuous: {cont}")

    # ---- drain baseline: every batch decodes the full cap (the
    # longest row gates the batch; max of 80 draws ~= cap) ----
    nb = args.requests // args.batch
    _prog("drain: warmup")
    bi = jnp.asarray(ids[: args.batch])
    bim = jnp.asarray(images[: args.batch])
    bl = jnp.full((args.batch,), prompt_len, np.int32)
    toks, _ = generate(
        params, cfg, bi, bim, bl, args.cap, eos_id=-1,
        kv_quant=kv_quant,
    )
    np.asarray(toks)
    _prog("drain: timed run")
    t0 = time.time()
    for k in range(nb):
        s = k * args.batch
        toks, _ = generate(
            params, cfg,
            jnp.asarray(ids[s : s + args.batch]),
            jnp.asarray(images[s : s + args.batch]),
            bl, args.cap, eos_id=-1, kv_quant=kv_quant,
        )
        np.asarray(toks)  # host readback fence
    drain_wall = time.time() - t0
    drain = {
        "wall_s": round(drain_wall, 2),
        "imgs_per_sec": round(nb * args.batch / drain_wall, 3),
        "steps": nb * args.cap,
    }
    _prog(f"drain: {drain}")

    print(json.dumps({
        "metric": "continuous_vs_drain",
        "batch": args.batch,
        "requests": args.requests,
        "cap_tokens": args.cap,
        "chunk": args.chunk,
        "weights": args.weights,
        "kv": kv_mode,
        "budget_mean": round(float(budgets.mean()), 1),
        "budget_p10_p90": [
            int(np.percentile(budgets, 10)),
            int(np.percentile(budgets, 90)),
        ],
        "continuous": cont,
        "drain": drain,
        "speedup": round(drain["imgs_per_sec"] and
                         cont["imgs_per_sec"] / drain["imgs_per_sec"], 3),
        "note": (
            "budgets stand in for EOS exits (random weights emit no "
            "real EOS); drain pays max-of-batch (~cap) per batch, "
            "continuous pays mean+chunk quantization+refill overhead; "
            "both walls include prefill and host readback fences"
        ),
    }))


if __name__ == "__main__":
    main()
