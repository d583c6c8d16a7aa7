"""Quantized-FROZEN-BASE damage to the DPA *training* signal at 7B
shapes on the real chip (round-4 verdict item 6).

The single-chip 13B recipe trains bf16 LoRA on an int4 frozen base
(TRAIN13B_ANCHOR.json: the int8 base does not fit) — but all prior
quantization-quality evidence was serving-side. This measures what a
quantized base does to the training signal itself, per the reference
loss math (alignment pos/neg phrase logps + KL-vs-ref,
llava/train/halva_trainer.py:534-590):

for each --base mode (bf16 | int8 | int4 | int4g), with the same seeded
host weights + same seeded host LoRA factors + same synthetic DPA batch:
  - DPA loss parts (total, alignment, KL) and the LoRA gradients from
    trainer.dpa_step_fns' own loss_and_grads — the exact quantity
    train_step differentiates; the KL term's ref logits come from the
    SAME quantized base (ref_params=None), exactly as the 13B recipe
    runs it;
  - gradients land in an npz for --report: cosine similarity and
    relative L2 vs the bf16-base gradients.

A tiny CPU twin of the whole measurement is
tests/test_quant_quality_train.py (keeps this script honest on the
cheap path).

    python scripts/quant_quality_train.py --base bf16
    python scripts/quant_quality_train.py --base int4
    python scripts/quant_quality_train.py --report
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from halva_tpu.envflags import apply_tpu_env_flags  # noqa: E402

apply_tpu_env_flags()
os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from halva_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX  # noqa: E402

OUT_DIR = os.environ.get("HALVA_QQT_DIR", "/tmp/halva_qq_train")
T0 = time.time()
SEQ = int(os.environ.get("HALVA_QQT_SEQ", "256"))
RANK = int(os.environ.get("HALVA_QQT_RANK", "32"))


def _prog(msg):
    print(f"[qqt +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def make_batch(cfg, b=1, s=SEQ, seed=11, vocab_hi=30000):
    """Synthetic DPA batch (schema of train/data.py collate; shapes per
    tests/test_trainer.py::_fake_batch, scaled to 7B seq). vocab_hi
    must stay under the model's vocab (tiny test configs pass ~200)."""
    rng = np.random.RandomState(seed)

    def ids_group(with_signs):
        ids = rng.randint(5, vocab_hi, (b, s)).astype(np.int32)
        ids[:, 1] = IMAGE_TOKEN_INDEX
        seg = np.ones((b, s), np.int32)
        seg[:, s - 2:] = 0
        labels = ids.copy()
        labels[:, : s // 2] = IGNORE_INDEX
        labels[seg == 0] = IGNORE_INDEX
        signs = np.zeros((b, s), np.int32)
        if with_signs:
            # phrases must sit fully inside the labeled/valid region —
            # a phrase with zero valid tokens makes log(0) = nan
            signs[:, s // 2: s // 2 + 4] = 1
            signs[:, s // 2 + 5: s // 2 + 9] = 2
        return ids, seg, labels, signs

    ids, seg, lab, sg = ids_group(True)
    nids, nseg, nlab, nsg = ids_group(True)
    rids, rseg, rlab, _ = ids_group(False)
    im = cfg.vision.image_size
    return {
        "input_ids": ids, "segment_ids": seg, "labels": lab,
        "pos_signs": sg,
        "neg_input_ids": nids, "neg_segment_ids": nseg,
        "neg_labels": nlab, "neg_signs": nsg,
        "ref_input_ids": rids, "ref_segment_ids": rseg,
        "ref_labels": rlab,
        "images": rng.randn(b, 3, im, im).astype(np.float32),
        "ref_images": rng.randn(b, 3, im, im).astype(np.float32),
    }


def add_lora_host(params, rank, seed=13):
    """Deterministic host-numpy LoRA factors on the LLM layer stacks —
    identical across base modes; added AFTER quantization (the 13B
    recipe quantizes the frozen base, then trains bf16 adapters)."""
    rng = np.random.RandomState(seed)
    layers = params["llm"]["layers"]
    for grp, keys in (("attn", ("wq", "wk", "wv", "wo")),
                      ("mlp", ("gate", "up", "down"))):
        for k in keys:
            node = layers[grp][k]
            if "kernel" in node:
                nl, kin, kout = node["kernel"].shape
            elif "kernel_q4p" in node:
                nl, kin = node["kernel_q4p"].shape[:2]
                kout = node["kernel_q4p"].shape[2] * 2
            else:
                nl, kin, kout = node["kernel_q"].shape
            node["lora_a"] = (
                rng.randn(nl, kin, rank).astype(np.float32) * 0.01
            )
            node["lora_b"] = (
                rng.randn(nl, rank, kout).astype(np.float32) * 0.01
            )
            # leading dim matches the stacked kernel (lax.scan slices
            # every leaf uniformly — lora.add_lora convention)
            node["lora_scale"] = np.full((nl,), 2.0, np.float32)
    return params


def measure(params, cfg, tcfg, batch):
    """Loss parts + LoRA grads via the trainer's own loss_and_grads."""
    import optax

    from halva_tpu.train import trainer as T

    trainable, frozen, _, _ = T.init_train_state(params, tcfg)
    train_step, _ = T.dpa_step_fns(cfg, tcfg, optax.sgd(0.0))
    fn = jax.jit(train_step.loss_and_grads)
    loss, parts, grads = fn(trainable, frozen, None, batch)
    return (
        float(np.asarray(loss)),
        float(np.asarray(parts.alignment)),
        float(np.asarray(parts.divergence)),
        jax.tree.map(lambda g: np.asarray(g, np.float32), grads),
    )


def run_base(mode):
    import quant_quality as qq

    from halva_tpu.config import LLAVA_V15_7B
    from halva_tpu.train import trainer as trainer_lib

    cfg = LLAVA_V15_7B
    _prog(f"base={mode}: host tree")
    host = qq.host_bf16_tree(cfg)
    _prog("quantize")
    quant = qq.quantize_mode(host, mode)
    del host
    quant = add_lora_host(quant, RANK)
    _prog("device_put")
    params = jax.tree.map(jnp.asarray, quant)
    del quant

    tcfg = trainer_lib.TrainConfig(
        learning_rate=0.0,
        grad_accum_steps=1,
        num_train_steps=1,
        attn_impl="auto",
        remat=True,
        loss_chunk=256,
    )
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    _prog("loss_and_grads (compile + run)")
    loss, alignment, kl, grads = measure(params, cfg, tcfg, batch)
    _prog(f"loss={loss:.6f} align={alignment:.6f} kl={kl:.6f}")

    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez(
        os.path.join(OUT_DIR, f"base_{mode}.npz"),
        **{
            "/".join(str(getattr(k, "key", k)) for k in kp): v
            for kp, v in flat
        },
        _loss=np.float32(loss),
        _alignment=np.float32(alignment),
        _kl=np.float32(kl),
    )
    print(f"{mode}: saved to {OUT_DIR}")


def compare(base_npz, z):
    keys = sorted(k for k in z.files if not k.startswith("_"))
    bkeys = sorted(k for k in base_npz.files if not k.startswith("_"))
    assert keys == bkeys, (keys[:3], bkeys[:3])
    va = np.concatenate([base_npz[k].ravel() for k in keys])
    vb = np.concatenate([z[k].ravel() for k in keys])
    cos = float(
        np.dot(va, vb)
        / max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-30)
    )
    rel = float(np.linalg.norm(vb - va) / max(np.linalg.norm(va), 1e-30))
    return cos, rel


def report():
    # reference base: bf16 when it ran; else int8. The bf16 base CANNOT
    # run at 7B on one 15.75G chip (13.4G weights + DPA activations
    # measured 17.57G — r5c qt_bf16 OOM), so the on-chip artifact
    # compares int4/int4g against the int8 base, whose own fidelity to
    # bf16 is pinned two ways: per-matmul rel err 1.25% / serving top-1
    # 1.0 (QUANT_QUALITY.json) and the tiny-scale CPU bf16-vs-int8
    # gradient-cosine oracle (tests/test_quant_quality_train.py).
    ref_mode = "bf16"
    ref_p = os.path.join(OUT_DIR, "base_bf16.npz")
    if not os.path.exists(ref_p):
        ref_mode = "int8"
        ref_p = os.path.join(OUT_DIR, "base_int8.npz")
    base = np.load(ref_p)
    out = {}
    for mode in ("int8", "int4", "int4g"):
        if mode == ref_mode:
            continue
        p = os.path.join(OUT_DIR, f"base_{mode}.npz")
        if not os.path.exists(p):
            continue
        z = np.load(p)
        cos, rel = compare(base, z)
        out[mode] = {
            "loss": [float(z["_loss"]), float(base["_loss"])],
            "alignment": [
                float(z["_alignment"]), float(base["_alignment"])
            ],
            "kl": [float(z["_kl"]), float(base["_kl"])],
            f"grad_cosine_vs_{ref_mode}": round(cos, 5),
            f"grad_rel_l2_vs_{ref_mode}": round(rel, 5),
        }
    result = {
        "metric": "dpa_train_quant_quality",
        "seq": SEQ,
        "lora_rank": RANK,
        "reference_base": ref_mode,
        **(
            {
                "reference_note": (
                    "bf16 base does not fit one chip at 7B (17.57G "
                    "vs 15.75G); int8 stands in, itself bounded vs "
                    "bf16 by QUANT_QUALITY.json per-matmul 1.25% and "
                    "the CPU oracle test at tiny scale"
                )
            }
            if ref_mode != "bf16"
            else {}
        ),
        f"modes_vs_{ref_mode}_base": out,
        "note": (
            "same seeded 7B host weights + LoRA factors + DPA batch per "
            "mode; KL ref logits from the SAME quantized base "
            "(ref_params=None — the 13B single-chip recipe's exact "
            "configuration, TRAIN13B_ANCHOR.json); loss math per "
            "reference halva_trainer.py:534-590; grads are the LoRA "
            "tree train_step differentiates (trainer.loss_and_grads)"
        ),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(OUT_DIR, "report.json"), "w") as f:
        json.dump(result, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", choices=["bf16", "int8", "int4", "int4g"])
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()
    if args.report:
        report()
    else:
        assert args.base, "--base or --report"
        run_base(args.base)


if __name__ == "__main__":
    main()
