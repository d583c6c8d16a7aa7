"""Convert an HF LLaVA/Llama/CLIP checkpoint dir to a native orbax params
dir that halva_tpu.train.run consumes.

    python scripts/convert_checkpoint.py \
        --hf-dir /ckpt/llava-v1.5-7b \
        [--vision-tower-dir /ckpt/clip-vit-large-patch14-336] \
        --out /ckpt/llava-v1.5-7b-orbax [--dtype bfloat16]

Runs entirely on host CPU (no TPU needed).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hf-dir", required=True)
    p.add_argument("--vision-tower-dir", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from halva_tpu.models.builder import load_pretrained_model
    from halva_tpu.train.checkpoint import save_params

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params, cfg = load_pretrained_model(
        args.hf_dir,
        vision_tower_path=args.vision_tower_dir,
        dtype=dtype,
    )
    save_params(args.out, params)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"wrote {args.out}: {n/1e9:.2f}B params, config {cfg}")


if __name__ == "__main__":
    main()
