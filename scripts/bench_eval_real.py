"""Real-pipeline CHAIR-500 eval wall-clock on the chip (verdict item 3).

bench.py times synthetic in-memory decode; bench_eval_hostio.py times
the BatchedGenerator pipeline on files but builds params in-process.
This is the full user path, end to end, exactly as `docs/MIGRATION.md`
tells a reference user to run it:

  1. fixture (built once, on CPU): a REAL-size llava-7b component
     checkpoint on disk (random bf16 weights — no downloads here;
     load/quantize cost is weight-value independent), a real fast
     tokenizer, and the 500 CHAIR images as JPEGs on disk.
  2. `python -m halva_tpu.evals.cli chair --quant int4 --kv-quant` as a
     subprocess on the real chip, timed COLD (host quantize + cache
     save) and WARM (quant-tree disk cache hit) — the checkpoint-load
     half of verdict item 5's "params on device well under 2 min".

Covers what the synthetic bench does not: checkpoint load, host int4
quantize + treecache, JPEG decode/resize/normalize with prefetch
overlap, bucketing, EOS exit, answers-file write. Reference
counterpart: eval_hall/model_vqa_loader.py:96-129 + chair.sh.

    python scripts/bench_eval_real.py [--images 500] [--batch 56]
        [--tokens 128] [--setup-only]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FIX = "/tmp/chair_fixture"


def setup(n_images: int):
    os.makedirs(FIX, exist_ok=True)
    # tok_bpe: the merge-trained fixture (tests/tokutil.py
    # build_bpe_tokenizer) with llama-like tokens-per-char — the round-4
    # char-level fixture inflated CHAIR prompts to Sp=831 vs the real
    # ~630 (verdict item 7) and alone OOM'd the b56 int8-KV config. New
    # dir name busts the persisted /tmp fixture from round 4.
    tok_dir = os.path.join(FIX, "tok_bpe")
    comp = os.path.join(FIX, "components")
    img_dir = os.path.join(FIX, "imgs")

    if not os.path.exists(os.path.join(tok_dir, "tokenizer_config.json")):
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from tokutil import build_bpe_tokenizer

        build_bpe_tokenizer(tok_dir)
        print("[setup] BPE tokenizer built", flush=True)

    if not os.path.exists(os.path.join(img_dir, ".done")):
        import numpy as np
        from PIL import Image

        from halva_tpu.evals.runner import chair500_image_list

        os.makedirs(img_dir, exist_ok=True)
        rng = np.random.RandomState(0)
        names = chair500_image_list()[:n_images]
        for name in names:
            # realistic decode cost: VGA-ish photos, quality 90
            arr = rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                os.path.join(img_dir, name), quality=90
            )
        open(os.path.join(img_dir, ".done"), "w").write(str(len(names)))
        print(f"[setup] {len(names)} JPEGs written", flush=True)

    if not os.path.exists(os.path.join(comp, "config.json")):
        # 7B param init on host CPU only — never on the relay TPU
        import jax

        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from halva_tpu.config import LLAVA_V15_7B
        from halva_tpu.models import llava
        from halva_tpu.train import vila as vila_lib

        t0 = time.time()
        params = llava.init_params(
            jax.random.PRNGKey(0), LLAVA_V15_7B, jnp.bfloat16
        )
        print(f"[setup] 7B params built ({time.time()-t0:.0f}s)", flush=True)
        vila_lib.save_components(comp, params, LLAVA_V15_7B)
        print(f"[setup] components saved ({time.time()-t0:.0f}s)", flush=True)
    return tok_dir, comp, img_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=500)
    p.add_argument("--batch", type=int, default=56)
    p.add_argument("--tokens", type=int, default=128)
    p.add_argument("--quant", default="int4")
    # int4 prompt KV by default: at the fixture's REAL prompt length
    # (Sp=831 — the char-level tokenizer runs ~200 tokens past real
    # CHAIR prompts) the b56 int8 prompt KV alone is 2x5.69 GB and the
    # program OOMs at 18.4 G > 15.75 G (stderr_cold.log 2026-08-20);
    # int4 KV halves it and matches the bench.py round-4 default.
    p.add_argument("--kv-quant", default="int4")
    p.add_argument("--continuous", action="store_true",
                   help="pass --continuous to the eval CLI (EOS-freed "
                        "slot refill, ops/continuous.py)")
    p.add_argument("--spec", type=int, default=0,
                   help="pass --spec K to the eval CLI (prompt-lookup "
                        "speculative greedy decode, ops/speculative.py)")
    p.add_argument("--setup-only", action="store_true")
    p.add_argument("--warm-only", action="store_true",
                   help="skip the cold (cache-rebuild) run")
    p.add_argument("--cold-wall-s", type=float, default=0.0,
                   help="with --warm-only: merge a previously measured "
                        "cold wall-clock into the report")
    args = p.parse_args()

    tok_dir, comp, img_dir = setup(args.images)
    if args.setup_only:
        return

    cache_dir = os.path.join(FIX, "qcache")
    results = {}
    runs = ("warm",) if args.warm_only else ("cold", "warm")
    for run in runs:
        if run == "cold":
            subprocess.run(["rm", "-rf", cache_dir])
        out = os.path.join(FIX, f"answers_{run}.jsonl")
        cmd = [
            sys.executable, "-m", "halva_tpu.evals.cli", "chair",
            "--model-path", comp, "--tokenizer", tok_dir,
            "--image-folder", img_dir, "--answers-file", out,
            "--batch-size", str(args.batch),
            "--max-new-tokens", str(args.tokens),
            "--quant", args.quant, "--kv-quant", args.kv_quant,
        ]
        if args.continuous:
            cmd.append("--continuous")
        if args.spec >= 2:
            cmd.extend(["--spec", str(args.spec)])
        phase_json = os.path.join(FIX, f"phases_{run}.json")
        env = dict(
            os.environ,
            HALVA_QUANT_CACHE=cache_dir,
            HALVA_PHASE_JSON=phase_json,
        )
        print(f"[{run}] {' '.join(cmd)}", flush=True)
        t0 = time.time()
        err_path = os.path.join(FIX, f"stderr_{run}.log")
        with open(err_path, "w") as ef:
            r = subprocess.run(
                cmd, env=env, cwd=REPO, stdout=ef, stderr=subprocess.STDOUT,
                text=True,
            )
        wall = time.time() - t0
        if r.returncode != 0:
            sys.stderr.write(open(err_path).read()[-3000:])
            print(json.dumps(
                {"error": f"{run} rc={r.returncode}", "log": err_path}
            ))
            sys.exit(1)
        n = sum(1 for _ in open(out))
        results[run] = {
            "wall_s": round(wall, 1),
            "answers": n,
            "imgs_per_sec_incl_startup": round(n / wall, 3),
        }
        # verdict item 3: per-phase startup attribution from the
        # subprocess (utils/phases.py; device_put is fenced per leaf in
        # this mode, so it includes ~one relay RTT per tree leaf)
        if os.path.exists(phase_json):
            with open(phase_json) as pf:
                results[run]["phases"] = json.load(pf)
        print(f"[{run}] {wall:.0f}s for {n} answers", flush=True)

    if args.warm_only and args.cold_wall_s:
        # merge a cold run recorded by a previous (interrupted) invocation
        results["cold"] = {
            "wall_s": round(args.cold_wall_s, 1),
            "answers": args.images,
            "imgs_per_sec_incl_startup": round(
                args.images / args.cold_wall_s, 3
            ),
        }
    print(json.dumps({
        "metric": "chair500_real_pipeline",
        "images": args.images,
        "batch": args.batch,
        "decode_tokens": args.tokens,
        "quant": args.quant,
        "kv_quant": args.kv_quant,
        "continuous": args.continuous,
        "spec": args.spec,
        **{k: results[k] for k in ("cold", "warm") if k in results},
        "note": (
            "full evals/cli chair subprocess: checkpoint load + int4 "
            "quantize (cold) / quant-tree cache hit (warm) + JPEG "
            "decode + prefetch + bucketed batched decode + EOS exit + "
            "answers write; imgs_per_sec_incl_startup divides by TOTAL "
            "wall incl. model load and compile"
        ),
    }))


if __name__ == "__main__":
    main()
