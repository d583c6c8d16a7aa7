"""Host-side training-data pipeline throughput (round-3 verdict weak 2).

The <1.5 h 7B train claim assumes the host keeps the device fed: at
the measured packed step (3031.6 ms for 2.0 samples, TRAIN7B_PACK) a
v5e-8 data-parallel slice consumes 8 x 0.66 = 5.3 samples/s; the
unpacked B=2 step (2390 ms) consumes 8 x 0.84 = 6.7. This measures
what one host core actually produces through the REAL pipeline —
HallDataset.__getitem__ (JPEG decode + CLIP preprocess + tokenize +
MASK-span sign alignment, train/data.py) then collate or first-fit
packing (train/pack.py) — and reports the host:device ratio. The
train loop overlaps this on a producer thread (utils/prefetch.py,
run.py host_batch_stream), so < 100% of step time means the host is
fully hidden.

    python scripts/bench_train_host.py [--samples 128] [--mean-words 60]

No chip needed: this is a pure host measurement. Reference
counterpart: dataloader_num_workers 8 in src/hallava_7b.sh:62 (the
reference assumes 8 worker processes; this container has 1 core, the
v5e-8 host has many — 1-core numbers are the conservative floor).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


WORDS = (
    "red car two dogs small blue bike cat people walking street tree "
    "building window table chair plate food bowl glass light sign bus "
    "train bird horse sheep elephant zebra giraffe umbrella handbag"
).split()


def make_records(tmp, n, mean_words, rng):
    import json as _json

    from PIL import Image

    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    recs, refs = [], []
    n_imgs = min(n, 32)  # images repeat; decode cost is per-sample anyway
    for i in range(n_imgs):
        arr = rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"im_{i}.jpg"), quality=90
        )

    def sent(k):
        ws = [WORDS[rng.randint(len(WORDS))] for _ in range(k)]
        # two MASKed hallucination spans per answer, like HALVA data
        a, b = sorted(rng.choice(max(2, k - 3), 2, replace=False))
        ws_m = list(ws)
        ws_m[a] = "<MASK>" + ws_m[a]
        ws_m[a + 1] = ws_m[a + 1] + "</MASK>"
        ws_m[b + 2] = "<MASK>" + ws_m[b + 2]
        ws_m[min(b + 3, len(ws_m) - 1)] += "</MASK>"
        return " ".join(ws), " ".join(ws_m)

    for i in range(n):
        k = max(8, int(rng.normal(mean_words, mean_words / 3)))
        pos, pos_m = sent(k)
        neg, neg_m = sent(k)
        recs.append({
            "id": i, "tag": ["closed", "open"][i % 2],
            "raw_answer": ["Yes", "No"][i % 2],
            "image": f"im_{i % n_imgs}.jpg",
            "question": "<image>\nDescribe the scene in detail.",
            "correct_answer": pos, "correct_answer_masked": pos_m,
            "hallucinated_answer": neg, "hallucinated_answer_masked": neg_m,
        })
        refs.append({
            "conversations": [
                {"from": "human", "value": "<image>\nDescribe."},
                {"from": "gpt", "value": sent(k)[0]},
            ],
            "image": f"im_{i % n_imgs}.jpg",
        })
    dp = os.path.join(tmp, "data.json")
    rp = os.path.join(tmp, "ref.json")
    with open(dp, "w") as f:
        _json.dump(recs, f)
    with open(rp, "w") as f:
        _json.dump(refs, f)
    return dp, rp, img_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=128)
    p.add_argument("--mean-words", type=int, default=60,
                   help="answer length; HALVA answers are a few sentences")
    p.add_argument("--max-length", type=int, default=2048)
    p.add_argument("--pack-seq-len", type=int, default=2624)
    args = p.parse_args()

    from tokutil import build_tiny_tokenizer
    from transformers import AutoTokenizer

    from halva_tpu.mm_utils import ImageProcessor
    from halva_tpu.train.data import HallDataset, collate
    from halva_tpu.train.pack import PackedDPABatcher

    tmp = "/tmp/halva_host_bench"
    os.makedirs(tmp, exist_ok=True)
    tok_dir = os.path.join(tmp, "tok")
    if not os.path.exists(os.path.join(tok_dir, "tokenizer_config.json")):
        build_tiny_tokenizer(tok_dir)
    tok = AutoTokenizer.from_pretrained(tok_dir)
    rng = np.random.RandomState(0)
    dp, rp, imgs = make_records(tmp, args.samples, args.mean_words, rng)

    proc = ImageProcessor(size=336, crop_size=336)
    t0 = time.perf_counter()
    ds = HallDataset(
        dp, rp, tok, proc, image_folder=imgs, max_length=args.max_length
    )
    t_init = time.perf_counter() - t0

    # __getitem__: JPEG decode + preprocess + tokenize + sign alignment
    t0 = time.perf_counter()
    items = [ds[i] for i in range(len(ds))]
    items = [s for s in items if s is not None]
    t_get = time.perf_counter() - t0
    n = len(items)

    # unpacked collate at the recipe micro-batch
    t0 = time.perf_counter()
    for i in range(0, n - 16, 16):
        collate(items[i : i + 16], pad_token_id=0)
    t_collate = time.perf_counter() - t0

    # first-fit packing (train/pack.py)
    batcher = PackedDPABatcher(
        seq_len=args.pack_seq_len, pn_rows=2, ref_rows=1,
        max_samples=16, num_image_tokens=576, pad_token_id=0,
        image_shape=(3, 336, 336),
    )
    t0 = time.perf_counter()
    packed = list(batcher.batches(iter(items)))
    t_pack = time.perf_counter() - t0
    packed_samples = sum(int(b["n_samples"]) for b in packed)

    per_sample_ms = (t_get + t_collate) / n * 1e3
    host_sps = n / (t_get + t_collate)
    pack_sps = packed_samples / (t_get + t_pack) if packed_samples else 0.0

    # measured device consumption (TRAIN7B_PACK.json / PERF.md)
    DEV = {
        "unpacked_7b_B2_sps_chip": 2 / 2.390,
        "packed_7b_sps_chip": 2.0 / 3.0316,
    }
    out = {
        "metric": "train_host_pipeline",
        "samples": n,
        "mean_words": args.mean_words,
        "dataset_init_s": round(t_init, 2),
        "getitem_ms_per_sample": round(t_get / n * 1e3, 2),
        "collate_ms_per_sample": round(t_collate / n * 1e3, 3),
        "pack_ms_per_sample": round(
            t_pack / packed_samples * 1e3, 3
        ) if packed_samples else None,
        "host_samples_per_sec_unpacked": round(host_sps, 2),
        "host_samples_per_sec_packed": round(pack_sps, 2),
        "device_needs_sps_v5e8_unpacked": round(
            8 * DEV["unpacked_7b_B2_sps_chip"], 2
        ),
        "device_needs_sps_v5e8_packed": round(
            8 * DEV["packed_7b_sps_chip"], 2
        ),
        "host_share_of_step_unpacked": round(
            8 * DEV["unpacked_7b_B2_sps_chip"] / host_sps, 3
        ),
        "host_share_of_step_packed": round(
            8 * DEV["packed_7b_sps_chip"] / pack_sps, 3
        ) if pack_sps else None,
        "note": (
            "1 core, char-level tokenizer (more tokens/word than a real "
            "BPE -> conservative); host_share < 1.0 means the producer "
            "thread (run.py host_batch_stream + utils/prefetch.py) "
            "fully hides host prep behind the device step"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
