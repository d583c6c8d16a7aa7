"""Interactive single-image chat (the reference try_halva.ipynb, L6).

    python scripts/chat.py --model-path pritamqu/halva7b-lora \
        --model-base liuhaotian/llava-v1.5-7b --image cat.jpg

Loads + merges the model once, then answers questions about the image
with batched-capable KV-cache greedy decode (batch of 1 here).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax.numpy as jnp


def main():
    from halva_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--model-base", default=None)
    p.add_argument("--vision-tower-path", default=None)
    p.add_argument("--image", required=True)
    p.add_argument("--conv-mode", default="v1")
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--quant", choices=["none", "int8"], default="none")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--question", default=None, help="one-shot question")
    p.add_argument("--num-beams", type=int, default=1,
                   help="beam search (HF semantics, ops/beam.py); "
                        "1 = greedy")
    args = p.parse_args()

    from transformers import AutoTokenizer

    from halva_tpu.conversation import get_template
    from halva_tpu.constants import DEFAULT_IMAGE_TOKEN
    from halva_tpu.mm_utils import (
        process_images,
        processor_for_vision,
        tokenizer_image_token,
    )
    from halva_tpu.models.builder import load_pretrained_model
    from halva_tpu.ops.generate import decode_tokens, generate_greedy

    params, cfg = load_pretrained_model(
        args.model_path,
        args.model_base,
        vision_tower_path=args.vision_tower_path,
        quant=args.quant,
    )
    tok_dir = args.tokenizer or args.model_base or args.model_path
    try:
        # reference loaders use the slow (sentencepiece) tokenizer
        tok = AutoTokenizer.from_pretrained(tok_dir, use_fast=False)
    except Exception:
        # fast-only tokenizer dirs (no sentencepiece model) still load
        tok = AutoTokenizer.from_pretrained(tok_dir, use_fast=True)
    template = get_template(args.conv_mode)
    # sized from the loaded config (CLIP-336 for llava-1.5, SigLIP-384
    # for VILA towers) — a hardcoded 336 processor broke every other
    # tower's pos-embed add
    proc = processor_for_vision(cfg.vision)
    image = Image.open(args.image).convert("RGB")
    pixels = process_images([image], proc, cfg.image_aspect_ratio)

    def answer(question: str) -> str:
        prompt = template.prompt(DEFAULT_IMAGE_TOKEN + "\n" + question)
        ids = tokenizer_image_token(prompt, tok)
        batch = np.asarray([ids], np.int32)
        if args.num_beams > 1:
            from halva_tpu.ops.beam import generate_beam

            toks, num = generate_beam(
                params,
                cfg,
                jnp.asarray(batch),
                jnp.asarray(pixels),
                jnp.asarray([len(ids)], np.int32),
                max_new_tokens=args.max_new_tokens,
                eos_id=tok.eos_token_id,
                num_beams=args.num_beams,
            )
        else:
            toks, num = generate_greedy(
                params,
                cfg,
                jnp.asarray(batch),
                jnp.asarray(pixels),
                jnp.asarray([len(ids)], np.int32),
                max_new_tokens=args.max_new_tokens,
                eos_id=tok.eos_token_id,
            )
        return decode_tokens(
            toks, num, tok, tok.eos_token_id,
            stop_strs=(template.stop_str(),),
        )[0]

    if args.question:
        print(answer(args.question))
        return
    print("Ask about the image (empty line to quit).")
    while True:
        try:
            q = input("USER: ").strip()
        except EOFError:
            break
        if not q:
            break
        print("ASSISTANT:", answer(q))


if __name__ == "__main__":
    main()
