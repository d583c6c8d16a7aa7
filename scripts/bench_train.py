"""Training-step throughput benchmark (reproduces the STATUS.md number).

    python scripts/bench_train.py [--hidden 2048 --layers 16 --batch 4]

Runs the full DPA train step (pos+neg 2B-row forward, policy-on-ref
forward, frozen-ref forward, backward over LoRA, AdamW) on the current
backend with host-readback fencing and prints ms/step + rough TF/s.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/halva_jax_cache")
import numpy as np
import jax.numpy as jnp

from halva_tpu.config import LlamaConfig, LlavaConfig, ViTConfig
from halva_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from halva_tpu.models import llava
from halva_tpu.train import lora as lora_lib
from halva_tpu.train import trainer as trainer_lib


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=2048)
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--inter", type=int, default=5504)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seq", type=int, default=64, help="text len (pre-splice)")
    p.add_argument("--lora-r", type=int, default=64)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    cfg = LlavaConfig(
        llm=LlamaConfig(
            vocab_size=32000, hidden_size=args.hidden,
            intermediate_size=args.inter, num_layers=args.layers,
            num_heads=args.heads, max_position_embeddings=4096,
        ),
        vision=ViTConfig(
            image_size=336, patch_size=14, hidden_size=1024,
            intermediate_size=4096, num_layers=12, num_heads=16,
        ),
    )
    tcfg = trainer_lib.TrainConfig(
        grad_accum_steps=1, num_train_steps=100, attn_impl="auto",
        remat=True,
    )
    params = llava.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    params = lora_lib.add_lora(
        params, jax.random.PRNGKey(1), rank=args.lora_r,
        alpha=2 * args.lora_r,
    )
    ref = llava.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    trainable, frozen, opt, opt_state = trainer_lib.init_train_state(
        params, tcfg
    )
    step, _ = trainer_lib.dpa_step_fns(cfg, tcfg, opt)
    step = jax.jit(step, donate_argnums=(0, 3))

    B, S = args.batch, args.seq
    rng = np.random.RandomState(0)

    def grp():
        ids = rng.randint(5, 30000, (B, S)).astype(np.int32)
        ids[:, 1] = IMAGE_TOKEN_INDEX
        seg = np.ones((B, S), np.int32)
        lab = ids.copy()
        lab[:, : S // 2] = IGNORE_INDEX
        sg = np.zeros((B, S), np.int32)
        sg[:, S // 2 : S // 2 + 3] = 1
        sg[:, S // 2 + 4 : S // 2 + 7] = 2
        return ids, seg, lab, sg

    i1, s1, l1, g1 = grp()
    i2, s2, l2, g2 = grp()
    i3, s3, l3, _ = grp()
    img = cfg.vision.image_size
    batch = {
        k: jnp.asarray(v)
        for k, v in dict(
            input_ids=i1, segment_ids=s1, labels=l1, pos_signs=g1,
            neg_input_ids=i2, neg_segment_ids=s2, neg_labels=l2,
            neg_signs=g2, ref_input_ids=i3, ref_segment_ids=s3,
            ref_labels=l3,
            images=rng.randn(B, 3, img, img).astype(np.float32),
            ref_images=rng.randn(B, 3, img, img).astype(np.float32),
        ).items()
    }

    t0 = time.time()
    trainable, opt_state, m = step(
        trainable, frozen, ref, opt_state, batch
    )
    print(f"compile+first: {time.time()-t0:.1f}s loss={float(m.loss):.4f}")
    t0 = time.time()
    for _ in range(args.iters):
        trainable, opt_state, m = step(
            trainable, frozen, ref, opt_state, batch
        )
    loss = float(m.loss)  # host readback = the only reliable fence here
    dt = (time.time() - t0) / args.iters
    n_params = sum(
        x.size for x in jax.tree.leaves(frozen) if x is not None
    )
    spliced = S + cfg.num_image_tokens - 1
    tok = 4 * B * spliced  # pos+neg (2B) + policy-ref (B) + frozen-ref (B)
    flops = 2 * n_params * tok * (1 + 3 / 4 * 3)  # fwd + bwd(2x)+remat on 3/4 rows
    print(
        f"step {dt*1e3:.0f} ms, loss {loss:.4f}, "
        f"~{flops/dt/1e12:.1f} TF/s (rough), backend={jax.default_backend()}"
    )


if __name__ == "__main__":
    main()
