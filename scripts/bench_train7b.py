"""Flagship-workload benchmark: the FULL llava-7b DPA train step on one
v5e chip, with the memory recipe that makes it fit, plus a v5e-8
wall-clock projection vs the reference's 1.5 h on 4xA100
(/root/reference/README.md:95).

    python scripts/bench_train7b.py [--batch 2 --text-len 512 ...]

Memory recipe (16 GB HBM):
- int8 base weights (QLoRA-class; reference's bitsandbytes path,
  train_halva.py:1036-1052), built on HOST and shipped once (~6.9 GB) —
  bf16 7B weights alone are 13.4 GB, and bf16 LoRA+grads+Adam do not fit
  beside them on one chip. On a v5e-8 FSDP slice the bf16 recipe shards
  to ~2.3 GB/chip and is the production configuration.
- dequant (w8) matmul mode for training — full-precision gradient path;
  W8A8 stays a serving optimization.
- bf16 LoRA r=128/alpha=256 on all LLM linears + bf16 Adam moments
  (~1.9 GB total).
- TrainConfig.loss_chunk=256: lm_head applied 256 tokens at a time inside
  a rematerialized scan — never materializes (B, S, 32000) fp32 logits
  (those alone would be >2 GB/row across the four forwards).
- remat on the layer scan; frozen reference model = THE SAME int8 base
  buffers (policy == base + LoRA, so the ref forward reuses the weights;
  zero extra HBM, replacing the reference's second DeepSpeed engine).

Step anatomy per micro-batch B: pos+neg forward (2B rows, grad),
policy-on-ref forward (B rows, grad), frozen-ref forward (B rows,
no grad), backward to LoRA, AdamW.
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
if os.environ.get("HALVA_BENCH_CPU"):  # CPU dry-run of this bench
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from halva_tpu.config import PRESETS
from halva_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from halva_tpu.ops import quant as quant_lib
from halva_tpu.train import lora as lora_lib
from halva_tpu.train import trainer as trainer_lib

# paper workload: ~21.5k contrastive samples, 1 epoch, effective batch 64
DATA_SAMPLES = 21_500
EFFECTIVE_BATCH = 64
A100_REFERENCE_HOURS = 1.5


def build_batch(cfg, b, text_len, rng):
    # stay inside the preset's vocab: tiny presets have vocab 256, and
    # OOB ids turn the embedding gather into garbage -> NaN loss
    hi = min(30000, cfg.llm.vocab_size)

    def grp():
        ids = rng.randint(5, hi, (b, text_len)).astype(np.int32)
        ids[:, 1] = IMAGE_TOKEN_INDEX
        seg = np.ones((b, text_len), np.int32)
        lab = ids.copy()
        lab[:, : text_len // 2] = IGNORE_INDEX
        sg = np.zeros((b, text_len), np.int32)
        sg[:, text_len // 2 : text_len // 2 + 3] = 1
        sg[:, text_len // 2 + 4 : text_len // 2 + 7] = 2
        return ids, seg, lab, sg

    i1, s1, l1, g1 = grp()
    i2, s2, l2, g2 = grp()
    i3, s3, l3, _ = grp()
    img = cfg.vision.image_size
    return {
        k: jnp.asarray(v)
        for k, v in dict(
            input_ids=i1, segment_ids=s1, labels=l1, pos_signs=g1,
            neg_input_ids=i2, neg_segment_ids=s2, neg_labels=l2,
            neg_signs=g2, ref_input_ids=i3, ref_segment_ids=s3,
            ref_labels=l3,
            images=rng.randn(b, 3, img, img).astype(np.float32),
            ref_images=rng.randn(b, 3, img, img).astype(np.float32),
        ).items()
    }


def synth_items(cfg, rng, mean_text, n):
    """Synthetic HallDataset-shaped items with variable text lengths
    (lognormal around mean_text, clipped to [32, 4*mean]) — the packed
    bench input. Real HALVA answers are a few sentences; the length
    knob makes the padding-waste assumption explicit instead of baking
    one length in."""
    hi = min(30000, cfg.llm.vocab_size)
    img = cfg.vision.image_size
    sigma = 0.5
    mu = np.log(mean_text) - sigma**2 / 2
    for _ in range(n):
        def doc(t):
            t = int(np.clip(t, 32, 4 * mean_text))
            ids = rng.randint(5, hi, t).astype(np.int32)
            ids[1] = IMAGE_TOKEN_INDEX
            lab = ids.copy()
            lab[: t // 2] = IGNORE_INDEX
            sg = np.zeros(t, np.int32)
            sg[t // 2 : t // 2 + 3] = 1
            sg[min(t // 2 + 4, t - 4) : min(t // 2 + 7, t - 1)] = 2
            return ids, lab, sg

        t = np.exp(rng.normal(mu, sigma))
        ids, lab, sg = doc(t)
        nids, nlab, nsg = doc(t * np.exp(rng.normal(0, 0.1)))
        rids, rlab, _ = doc(np.exp(rng.normal(mu, sigma)))
        yield {
            "input_ids": ids, "labels": lab, "pos_signs": sg,
            "neg_input_ids": nids, "neg_labels": nlab, "neg_signs": nsg,
            "ref_input_ids": rids, "ref_labels": rlab,
            "image": rng.randn(3, img, img).astype(np.float32),
            "ref_image": rng.randn(3, img, img).astype(np.float32),
        }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="llava-v1.5-7b")
    p.add_argument("--batch", type=int, default=2,
                   help="per-chip micro-batch (v5e-8 dp=8 -> global 16, "
                        "grad-accum 4 -> effective 64)")
    p.add_argument("--text-len", type=int, default=512,
                   help="pre-splice text length; spliced adds 575")
    p.add_argument("--lora-r", type=int, default=128)
    p.add_argument("--loss-chunk", type=int, default=256)
    p.add_argument("--optim", default="adamw",
                   choices=["adamw", "adamw8bit"],
                   help="adamw8bit (block-quantized moments) frees "
                        "~0.5 GB at 7B r=128 — required headroom for a "
                        "13B single-chip step attempt")
    p.add_argument("--base", default="int8", choices=["int8", "int4"],
                   help="frozen-base quantization. int8 is the 7B "
                        "single-chip recipe; int4 (packed, bf16-dequant "
                        "forward, models/llama.py dense kernel_q4p "
                        "branch) is what makes a 13B step FIT one v5e: "
                        "the int8-base 13B step needs 20.31G vs 15.75G "
                        "HBM (args 15.24G + 3G XLA relayout copies of "
                        "the frozen QKV stacks; measured 2026-08-19)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--pack", action="store_true",
                   help="packed-row step (train/pack.py): variable-"
                        "length synthetic samples packed into fixed "
                        "rows; throughput tracks real tokens")
    p.add_argument("--pack-rows", type=int, default=2)
    p.add_argument("--pack-seq-len", type=int, default=2624,
                   help="row length; default = recipe max_length 2048 "
                        "+ 575 image tokens, rounded to 64")
    p.add_argument("--mean-text", type=int, default=256,
                   help="mean pre-splice doc length for --pack")
    args = p.parse_args()

    cfg = PRESETS[args.preset]
    quant_lib.set_w8a8(False)  # training uses the dequant gradient path

    # synthetic quantized base tree, generated on device by default
    # (bench.synth_params; HALVA_BENCH_PARAM_GEN=host forces the numpy
    # path) — the host build costs ~20 min/process at 7B on this host
    import bench
    bench.setup_bench_env()  # bench serving-config env defaults (no longer an import side effect)

    params = bench.synth_params(cfg, args.base)
    params = lora_lib.add_lora(
        params, jax.random.PRNGKey(1), rank=args.lora_r,
        alpha=2.0 * args.lora_r,
    )
    tcfg = trainer_lib.TrainConfig(
        grad_accum_steps=1, num_train_steps=400, attn_impl="auto",
        remat=True, loss_chunk=args.loss_chunk, optim=args.optim,
    )
    trainable, frozen, opt, opt_state = trainer_lib.init_train_state(
        params, tcfg
    )
    # ref_params=None: the frozen reference model is DERIVED from
    # `frozen` inside the jitted step (trainer.ref_model_tree) — passing
    # the base tree as a second jit argument made the compile-time HBM
    # accounting count the 7B weights twice (measured +7G, OOM)
    ref = None

    rng = np.random.RandomState(0)
    if args.pack:
        from halva_tpu.train.pack import PackedDPABatcher

        seq = args.pack_seq_len
        rows = args.pack_rows
        mean_doc = args.mean_text + cfg.num_image_tokens - 1
        max_samples = max(2, int(rows * seq / (2 * mean_doc) * 1.4) + 1)
        batcher = PackedDPABatcher(
            seq_len=seq,
            pn_rows=rows,
            ref_rows=max(1, rows // 2),
            max_samples=max_samples,
            num_image_tokens=cfg.num_image_tokens,
            pad_token_id=0,
            image_shape=(3, cfg.vision.image_size,
                         cfg.vision.image_size),
        )
        items = synth_items(cfg, rng, args.mean_text,
                            64 * (args.iters + 1))
        batches = []
        for b_ in batcher.batches(items):
            batches.append({k: jnp.asarray(v) for k, v in b_.items()})
            if len(batches) >= args.iters + 1:
                break
        assert len(batches) >= 2, "not enough packed batches"
        step, _ = trainer_lib.packed_dpa_step_fns(
            cfg, tcfg, opt, max_samples=max_samples
        )
        step = jax.jit(step, donate_argnums=(0, 3))

        t0 = time.time()
        trainable, opt_state, m = step(
            trainable, frozen, ref, opt_state, batches[0]
        )
        first_loss = float(m.loss)
        print(f"compile+first: {time.time()-t0:.1f}s "
              f"loss={first_loss:.4f}", flush=True)

        timed = batches[1:][: args.iters]
        n_done = sum(int(b_["n_samples"]) for b_ in timed)
        t0 = time.time()
        for b_ in timed:
            trainable, opt_state, m = step(
                trainable, frozen, ref, opt_state, b_
            )
        loss = float(m.loss)
        dt = (time.time() - t0) / len(timed)
        samples_per_step = n_done / len(timed)
        hours = DATA_SAMPLES / (8 * samples_per_step) * dt / 3600
        n_llm = sum(
            x.size for x in jax.tree.leaves(frozen) if x is not None
        )
        ref_rows = max(1, rows // 2)
        # grad rows: pn rows + policy-ref rows; frozen-ref rows fwd-only
        tok_grad = (rows + ref_rows) * seq
        flops = 2 * n_llm * (3 * tok_grad + 1 * ref_rows * seq)
        out = {
            "metric": "dpa_%s_train_step_packed" % ("13b" if "13b" in args.preset else "7b"),
            "value": round(dt * 1e3, 1),
            "unit": "ms/step",
            "detail": {
                "preset": args.preset,
                "recipe": "packed rows (train/pack.py) + %s base + "
                          "bf16 LoRA r=%d + loss_chunk=%d + remat + %s"
                % (args.base, args.lora_r, args.loss_chunk, args.optim),
                "pn_rows": rows, "seq_len": seq,
                "mean_text_len": args.mean_text,
                "samples_per_step": round(samples_per_step, 2),
                "samples_per_sec_chip": round(samples_per_step / dt, 3),
                "loss_first": first_loss, "loss_now": loss,
                "tf_per_sec_rough": round(flops / dt / 1e12, 1),
                "v5e8_projection_hours": round(hours, 2),
                "a100x4_reference_hours": A100_REFERENCE_HOURS,
                "projection_note": "21.5k samples / (8 chips x %.2f "
                "samples/step)" % samples_per_step,
            },
        }
        print(json.dumps(out), flush=True)
        return

    step, _ = trainer_lib.dpa_step_fns(cfg, tcfg, opt)
    step = jax.jit(step, donate_argnums=(0, 3))

    batch = build_batch(cfg, args.batch, args.text_len, rng)

    t0 = time.time()
    trainable, opt_state, m = step(trainable, frozen, ref, opt_state, batch)
    first_loss = float(m.loss)  # host readback fence (axon: block_until_ready no-ops)
    print(f"compile+first: {time.time()-t0:.1f}s loss={first_loss:.4f}",
          flush=True)

    t0 = time.time()
    for _ in range(args.iters):
        trainable, opt_state, m = step(
            trainable, frozen, ref, opt_state, batch
        )
    loss = float(m.loss)
    dt = (time.time() - t0) / args.iters

    # FLOPs: grad rows = 2B (pos/neg) + B (policy-ref) each cost
    # fwd + dx-bwd + remat-fwd ~= 3x fwd; frozen-ref B rows cost 1x fwd.
    n_llm = sum(
        x.size for x in jax.tree.leaves(frozen) if x is not None
    )
    spliced = args.text_len + cfg.num_image_tokens - 1
    b = args.batch
    tok_grad = 3 * b * spliced
    tok_fwd = 1 * b * spliced
    flops = 2 * n_llm * (3 * tok_grad + 1 * tok_fwd)
    tfs = flops / dt / 1e12

    # v5e-8 projection: dp=8, per-chip micro-batch = args.batch, so one
    # multi-chip micro-step processes 8x this work at ~this step time
    # (FSDP all-gathers ride ICI; LoRA grads are tiny reduce-scatters).
    global_micro = 8 * b
    micro_steps = DATA_SAMPLES / global_micro
    hours = micro_steps * dt / 3600
    out = {
        "metric": "dpa_%s_train_step" % ("13b" if "13b" in args.preset else "7b"),
        "value": round(dt * 1e3, 1),
        "unit": "ms/step",
        "detail": {
            "preset": args.preset,
            "recipe": "%s base + bf16 LoRA r=%d + loss_chunk=%d + remat + %s"
            % (args.base, args.lora_r, args.loss_chunk, args.optim),
            "micro_batch": b,
            "text_len": args.text_len,
            "spliced_len": spliced,
            "loss_first": first_loss,
            "loss_now": loss,
            "tf_per_sec_rough": round(tfs, 1),
            "v5e8_projection_hours": round(hours, 2),
            "a100x4_reference_hours": A100_REFERENCE_HOURS,
            "projection_note": "21.5k samples / (8 chips x B%d) micro-steps"
            % b,
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
