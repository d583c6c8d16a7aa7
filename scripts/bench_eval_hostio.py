"""File-backed CHAIR-500-style eval run: host preprocessing vs device
decode (round-2 verdict item 8).

bench.py times the device path on synthetic in-memory arrays; a real
CHAIR run also pays PIL decode + pad-to-square + resize + normalize per
image on the host. This script writes N synthetic JPEGs to disk, runs
the REAL BatchedGenerator pipeline (tokenize -> per-batch image load ->
batched generate) with and without prefetch overlap, and reports
host_ms_per_img vs device_ms_per_img.

    python scripts/bench_eval_hostio.py [--images 112] [--batch 56] \\
        [--tokens 128] [--weights int4] [--prefetch 4]

Uses the local tiny tokenizer if HALVA_TOKENIZER is set, else a
whitespace stub (prompt content does not affect throughput).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np


class _StubTok:
    """Minimal tokenizer: hashes words to ids (throughput only)."""

    eos_token_id = 2
    bos_token_id = 1

    def __call__(self, text, **kw):
        ids = [1] + [5 + (hash(w) % 30000) for w in text.split()]

        class R:
            input_ids = ids

        return R()

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"w{i}" for i in ids)


def make_images(folder: str, n: int):
    from PIL import Image

    os.makedirs(folder, exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = os.path.join(folder, f"synth_{i:06d}.jpg")
        if not os.path.exists(p):
            arr = rng.randint(0, 255, (480, 640, 3), np.uint8)
            Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=112)
    ap.add_argument("--batch", type=int, default=56)
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--weights", default="int4",
                    choices=["int4", "int8", "bfloat16"])
    ap.add_argument("--prefetch", type=int, default=4)
    ap.add_argument("--preset", default="llava-v1.5-7b")
    args = ap.parse_args()

    import bench
    bench.setup_bench_env()  # bench serving-config env defaults (no longer an import side effect)
    from halva_tpu.evals.runner import BatchedGenerator, EvalRequest
    from halva_tpu.mm_utils import clip_vit_l_336_processor

    os.environ["HALVA_BENCH_PRESET"] = args.preset
    cfg = bench.pick_cfg()
    if args.weights == "int4":
        params = bench.init_params_host_int4(cfg)
    elif args.weights == "int8":
        params = bench.init_params_host_int8(cfg)
    else:
        import jax.numpy as jnp

        from halva_tpu.models import llava

        params = llava.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    tok_dir = os.environ.get("HALVA_TOKENIZER")
    if tok_dir:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(tok_dir)
        if tok.eos_token_id is None:
            tok = _StubTok()  # throughput only — ids don't matter
    else:
        tok = _StubTok()

    paths = make_images("/tmp/chair_synth", args.images)
    reqs = [
        EvalRequest(question_id=i, text="Describe the image in detail.",
                    image_path=p)
        for i, p in enumerate(paths)
    ]

    results = {}
    for prefetch in (0, args.prefetch):
        gen = BatchedGenerator(
            params, cfg, tok, clip_vit_l_336_processor(),
            batch_size=args.batch, max_new_tokens=args.tokens,
            prefetch_workers=prefetch, kv_quant=True,
        )
        gen.run(reqs[: args.batch])  # compile + warmup on one batch
        t0 = time.perf_counter()
        gen.run(reqs)
        wall = time.perf_counter() - t0
        results[f"prefetch_{prefetch}"] = {
            "imgs_per_sec": round(args.images / wall, 3),
            "wall_s": round(wall, 2),
            **gen.last_stats,
        }
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
