"""Decode-step cost breakdown on the real chip.

Times the prefill and decode phases separately at the bench
configuration (llava-7b int8 weights + int8 prompt KV, CHAIR-style
prompts), then re-runs with targeted pieces removed (monkey-patched
before the first trace) to attribute the per-step cost:

    python scripts/profile_decode.py --variant base     # full step
    python scripts/profile_decode.py --variant noattn   # attention (and
        its KV reads) replaced by zeros -> weights+mlp+head+loop cost
    python scripts/profile_decode.py --variant nohead   # lm_head removed
        (argmax fed zeros) -> isolates the vocab-projection read
    python scripts/profile_decode.py --variant sg8      # max_new=8 ->
        isolates generated-cache traffic (slope vs 128)
    python scripts/profile_decode.py --variant nf4      # 4-bit NF4 base
        weights -> tests the weight-read floor (int8 reads ~6.7GB/step)

Run each variant in its OWN process: the monkey patches must be in
place before jax traces the decode program.
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
import numpy as np
import jax.numpy as jnp

from halva_tpu.config import LLAVA_V15_7B
from halva_tpu.models import llama


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="base",
                   choices=["base", "noattn", "nohead", "sg8", "nf4",
                            "novision"])
    p.add_argument("--weights", default="int8", choices=["int8", "int4"])
    p.add_argument("--kv", default="int8", choices=["int8", "int4"],
                   help="prompt-KV cache quantization mode")
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--tokens", type=int, default=128)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    cfg = LLAVA_V15_7B
    max_new = 8 if args.variant == "sg8" else args.tokens

    if args.variant == "noattn":
        # stub BOTH attention paths: on TPU MHA decode dispatches to the
        # fused Pallas kernel (decode_attend_layer), not _decode_attend —
        # stubbing only the XLA oracle would silently measure the full
        # step (round-2 advisor finding)
        def stub_attend(q, kp, vp, kg, vg, prompt_seg, gen_valid,
                        **scales):
            b, _, h, dh = q.shape
            return jnp.zeros((b, 1, h, dh), q.dtype) + q * 0.0

        def stub_attend_layer(q, prompt_cache, prompt_seg, gen_cache=None,
                              gen_valid=None, layer=None, **kw):
            return q * 0.0

        from halva_tpu.ops import decode_attention as da_mod
        llama._decode_attend = stub_attend
        da_mod.decode_attend_layer = stub_attend_layer
    if args.variant == "novision":
        # vision tower + projector replaced by a zeros stub (with a data
        # dependence on the pixels so nothing upstream is DCEd) ->
        # isolates the tower's share of prefill
        from halva_tpu.models import llava as llava_mod

        def stub_encode(params, c, images):
            t = (c.vision.image_size // c.vision.patch_size) ** 2
            z = jnp.sum(images.astype(jnp.float32)) * 0.0
            return (
                jnp.zeros(
                    (images.shape[0], t, c.llm.hidden_size), jnp.bfloat16
                )
                + z.astype(jnp.bfloat16)
            )

        llava_mod.encode_images = stub_encode
        from halva_tpu.ops import generate as gen_mod0

        gen_mod0.llava.encode_images = stub_encode
    if args.variant == "nohead":
        real_lm_logits = llama.lm_logits

        def stub_logits(params, c, hidden):
            # keep a data dependence on hidden so the layers are not DCEd
            z = jnp.sum(hidden.astype(jnp.float32), axis=-1, keepdims=True)
            return jnp.zeros(
                (hidden.shape[0], hidden.shape[1], c.vocab_size),
                jnp.float32,
            ) + z
        llama.lm_logits = stub_logits

    import bench
    bench.setup_bench_env()  # bench serving-config env defaults (no longer an import side effect)
    from halva_tpu.ops import generate as gen_mod

    if args.variant == "nf4":
        from halva_tpu.ops import quant as quant_lib

        params_i8 = bench.init_params_host_int8(cfg)

        def to_nf4(node):
            if isinstance(node, dict):
                if "kernel_q" in node:
                    rng = np.random.RandomState(0)
                    shp = node["kernel_q"].shape
                    out = {k: v for k, v in node.items()
                           if k not in ("kernel_q", "kernel_scale")}
                    out["kernel_q4"] = jnp.asarray(
                        rng.randint(0, 16, shp, np.uint8).astype(np.uint8)
                    )
                    out["kernel_scale4"] = jnp.asarray(
                        np.full(shp[:-2] + (1, shp[-1]), 0.02, np.float32)
                        .astype(jnp.bfloat16)
                    )
                    return out
                return {k: to_nf4(v) for k, v in node.items()}
            return node
        params = to_nf4(params_i8)
        del params_i8
    else:
        # device-side synthetic tree (bench.synth_params): the host
        # build costs ~20 min/process on this platform and weight
        # VALUES are timing-irrelevant
        params = bench.synth_params(cfg, args.weights)

    if args.variant == "nohead":
        # restore nothing: prefill uses the stub too; first-token values
        # are meaningless but shapes/timing stand
        pass

    ids, images, lens = bench.make_inputs(cfg, args.batch)

    # Production serving is ONE program (generate: prefill + decode in a
    # single jit — see its docstring for why). Timing therefore measures
    # (a) a standalone prefill-only jit and (b) the full program;
    # decode = total - prefill. The prefill-only program returns its
    # cache to host refs that are immediately dropped, so no cache ever
    # crosses into another program (the layout-mismatch trap).
    t0 = time.time()
    ft, _, sl, pc, ps = gen_mod._prefill_phase(
        params, cfg, ids, images, lens, max_new, "auto", args.kv
    )
    float(jnp.sum(ft))  # readback fence
    prefill_compile = time.time() - t0
    del ft, sl, pc, ps

    t0 = time.time()
    toks, num = gen_mod.generate_greedy(
        params, cfg, ids, images, lens, max_new_tokens=max_new,
        eos_id=-1, kv_quant=args.kv,
    )
    np.asarray(toks)
    decode_compile = time.time() - t0

    prefill_times, total_times = [], []
    for _ in range(args.iters):
        t0 = time.time()
        ft, _, sl, pc, ps = gen_mod._prefill_phase(
            params, cfg, ids, images, lens, max_new, "auto", args.kv
        )
        float(jnp.sum(ft))
        prefill_times.append(time.time() - t0)
        del ft, sl, pc, ps
        t0 = time.time()
        toks, num = gen_mod.generate_greedy(
            params, cfg, ids, images, lens, max_new_tokens=max_new,
            eos_id=-1, kv_quant=args.kv,
        )
        np.asarray(toks)
        total_times.append(time.time() - t0)
    prefill_s = min(prefill_times)
    decode_s = min(total_times) - prefill_s

    print(json.dumps({
        "variant": args.variant,
        "weights": args.weights,
        "batch": args.batch,
        "max_new": max_new,
        "prefill_s": round(prefill_s, 4),
        "decode_s": round(decode_s, 4),
        "per_step_ms": round(decode_s / max_new * 1e3, 3),
        "prefill_compile_s": round(prefill_compile, 1),
        "decode_compile_s": round(decode_compile, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
