"""Benchmark: CHAIR-500-style eval decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: llava-v1.5-7b architecture (random bf16 weights — no weights are
downloadable in this environment; throughput is weight-value independent),
CHAIR-style prompts (576 spliced image tokens + short text), batched
KV-cached greedy decode of DECODE_TOKENS new tokens per image.

Baseline: the reference evaluates CHAIR with HF generate at batch size 1,
one process per A100 (eval_hall/model_vqa_loader.py:67, BASELINE.md). A
bs=1 fp16 llava-7b on A100 decodes ~35 tok/s => ~0.25 imgs/sec at this
token budget including prefill. vs_baseline = our imgs/sec / 0.25.

Env knobs: HALVA_BENCH_PRESET (llava-v1.5-7b | llava-small),
HALVA_BENCH_BATCH (override adaptive batch), HALVA_BENCH_TOKENS,
HALVA_BENCH_WEIGHTS (int4g default | int4 | int8 | bfloat16 — W4 packed
weights halve weight HBM, which buys the larger serving batch; the
JSON reports the mode + batch actually used, and failures re-exec down
the chain int4g/int4 -> int8 -> bf16), HALVA_BENCH_KV (int4 default |
int8 | off — prompt-KV cache dtype), HALVA_W4A8 (default on; takes
effect on per-channel-scale trees — int4g prefill uses the bf16
dequant branch), HALVA_BENCH_SPEC (K>=2 enables prompt-lookup
speculative greedy decode, ops/speculative.py).
Default = the QUALITY-CLEAN serving point (round-5 flip): b80 int4g
(grouped-K) weights + int4 prompt KV + 4-row decode grid —
QUANT_QUALITY_v2.json first_token_agreement 1.0 / top-1 1.0 at n=32,
where the round-4 flat-int4 default measured 0.9688 on the FIRST
greedy token. Flat int4 + W4A8 remains the documented fast mode
(8.98 imgs/s vs int4g 7.88 at b80) for workloads that accept its
first-token row.
"""

import json
import os
import sys
import time

import numpy as np

from halva_tpu.envflags import apply_tpu_env_flags


def setup_bench_env() -> None:
    """Bench process env defaults. Only the bench ENTRY POINT (and the
    scripts that deliberately reuse its measured-best serving config)
    may call this — `import bench` for the synth-tree helpers MUST stay
    side-effect-free. A module-level setdefault here once leaked
    HALVA_W4A8=1 into the whole pytest process via test collection
    (tests/test_synth_params.py imports bench), which silently flipped
    every int4 dense trace to W4A8 and broke the manual-TP int4 token-
    parity tests (W4A8's per-shard activation scales are a
    requantization, not bit-equal to single-device):
    tests/test_import_purity.py pins the no-side-effects contract.

    Defaults reproduce the measured-best serving point. Scoped-VMEM 64MB
    lets the fused decode kernel pack 4 rows per grid step
    (scripts/probe_rows_decode.py rc=0 on-chip; b56 int4+int8KV
    7.87 -> 7.99 imgs/s, SERVING_LADDER.json). W4A8 prefill + int4
    prompt KV: quality evidence on-chip (QUANT_QUALITY.json w4a8 top-1
    0.999 over 8x128 greedy steps; int4+int4KV 0.999), serving ladder
    b80 rows4+W4A8 = 8.98 imgs/s (SERVING_LADDER.json). Explicit env
    still wins (HALVA_W4A8=0 / HALVA_BENCH_KV=int8).

    Must run BEFORE jax's first backend init: libtpu snapshots
    LIBTPU_INIT_ARGS when the PJRT plugin loads."""
    os.environ.setdefault("HALVA_SCOPED_VMEM_MB", "64")
    os.environ.setdefault("HALVA_W4A8", "1")
    os.environ.setdefault("HALVA_BENCH_KV", "int4")
    apply_tpu_env_flags()


if __name__ == "__main__":
    setup_bench_env()

import jax


def setup_bench_cache() -> None:
    """Persistent compilation cache for the bench entry point: the
    remote-compile path in this image is slow for large programs; cache
    hits make reruns cheap. NOT run on import — stale cross-machine CPU
    AOT reuse from a shared cache dir corrupts numerics (see
    scripts/repro_stale_aot.py; /tmp is container-local and the chip
    programs are TPU-targeted, so the bench path itself is safe)."""
    os.makedirs("/tmp/halva_jax_cache", exist_ok=True)
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/halva_jax_cache"
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 5.0
        )
    except Exception:
        pass


if __name__ == "__main__":
    setup_bench_cache()

import jax.numpy as jnp

from halva_tpu.config import LLAVA_V15_7B, LlamaConfig, LlavaConfig, ViTConfig
from halva_tpu.constants import IMAGE_TOKEN_INDEX
from halva_tpu.models import llava
from halva_tpu.ops.generate import generate_greedy

DECODE_TOKENS = int(os.environ.get("HALVA_BENCH_TOKENS", "128"))
A100_BASELINE_IMGS_PER_SEC = 0.25

_T0 = time.time()


def _prog(msg):
    """Progress to stderr (stdout carries only the one JSON line)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)

SMALL = LlavaConfig(
    llm=LlamaConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2816,
        num_layers=8, num_heads=16, max_position_embeddings=4096,
    ),
    vision=ViTConfig(
        image_size=336, patch_size=14, hidden_size=512,
        intermediate_size=2048, num_layers=6, num_heads=8,
    ),
)


def pick_cfg():
    name = os.environ.get("HALVA_BENCH_PRESET", "llava-v1.5-7b")
    if name == "llava-small":
        return SMALL
    from halva_tpu.config import PRESETS

    return PRESETS.get(name, LLAVA_V15_7B)


def init_params_host_int8(cfg, seed=0):
    """Random int8 weights built on HOST and shipped once — the device
    never holds a bf16 copy (Array.delete() is a no-op on this relay
    platform, so on-device conversion would keep both trees resident)."""
    import jax as _jax

    rng = np.random.RandomState(seed)
    struct = _jax.eval_shape(
        lambda: llava.init_params(
            _jax.random.PRNGKey(0), cfg, jnp.bfloat16
        )
    )

    def leaf(v):
        return (
            rng.randn(*v.shape).astype(np.float32) * 0.02
        ).astype(jnp.bfloat16)

    def rewrite(node):
        if not isinstance(node, dict):
            if isinstance(node, (list, tuple)):
                return type(node)(rewrite(x) for x in node)
            return leaf(node) if hasattr(node, "shape") else node
        if "kernel" in node and len(node["kernel"].shape) in (2, 3):
            shp = node["kernel"].shape
            out = {k: rewrite(v) for k, v in node.items() if k != "kernel"}
            out["kernel_q"] = rng.randint(-127, 128, shp, np.int8)
            out["kernel_scale"] = np.full(
                shp[:-2] + (1, shp[-1]), 0.02 / 127, np.float32
            ).astype(jnp.bfloat16)
            return out
        if "embedding" in node and node["embedding"].shape[0] >= 4096:
            shp = node["embedding"].shape
            out = {
                k: rewrite(v) for k, v in node.items() if k != "embedding"
            }
            out["embedding_q"] = rng.randint(-127, 128, shp, np.int8)
            out["embedding_scale"] = np.full(
                (shp[0], 1), 0.02 / 127, np.float32
            ).astype(jnp.bfloat16)
            return out
        return {k: rewrite(v) for k, v in node.items()}

    host = rewrite(struct)
    return jax.tree.map(jnp.asarray, host)


def init_params_host_int4(cfg, seed=0):
    """int8 build, then the stacked (L, in, out) LLM layer kernels drop
    to symmetric int4 (ops/w4_matmul serving path): weight bytes halve
    again (llava-7b decode is weight-bandwidth-bound at int8 — 8.3 of a
    20.8 ms b24 step). Embeddings, lm_head, vision tower and projector
    (2D kernels) stay int8."""
    rng = np.random.RandomState(seed)

    def rewrite(node):
        if isinstance(node, dict):
            if "kernel_q" in node and node["kernel_q"].ndim == 3:
                shp = node["kernel_q"].shape  # (L, in, out)
                out = {
                    k: v for k, v in node.items()
                    if k not in ("kernel_q", "kernel_scale")
                }
                q = rng.randint(-7, 8, shp).astype(np.int32)
                lo = q[:, :, : shp[2] // 2] & 0xF
                hi = q[:, :, shp[2] // 2 :] & 0xF
                packed = (hi << 4) | lo
                out["kernel_q4p"] = jnp.asarray(
                    (packed - 256 * (packed > 127)).astype(np.int8)
                )
                out["kernel_scale4p"] = jnp.asarray(
                    np.full(
                        (shp[0], 2, 1, shp[2] // 2), 0.02 / 7, np.float32
                    ).astype(jnp.bfloat16)
                )
                return out
            return {k: rewrite(v) for k, v in node.items()}
        return node

    return rewrite(init_params_host_int8(cfg, seed))


def _synth_spec(cfg, weights: str):
    """Leaf-spec tree for the synthetic serving params: mirrors the
    structure/dtype rules of init_params_host_int8/int4 exactly (kernel
    2D/3D -> int8 [+ 3D -> packed int4], embedding rows>=4096 -> int8,
    everything else bf16 randn*0.02), but as a plan that can be executed
    ON DEVICE. Leaves are ("randn"|"int8"|"int4p"|"const", shape[, value,
    dtype])."""
    struct = jax.eval_shape(
        lambda: llava.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    )

    def rewrite(node):
        if not isinstance(node, dict):
            if isinstance(node, (list, tuple)):
                return type(node)(rewrite(x) for x in node)
            return ("randn", tuple(node.shape))
        if "kernel" in node and len(node["kernel"].shape) in (2, 3):
            shp = tuple(node["kernel"].shape)
            out = {k: rewrite(v) for k, v in node.items() if k != "kernel"}
            if weights in ("int4", "int4g") and len(shp) == 3:
                # any random byte is a valid packed nibble pair — no
                # pack math needed for a throughput-only tree. int4g =
                # grouped-K scales (K=128, w4_matmul group layout): same
                # weight bytes, G scale rows instead of 1.
                ng = (
                    shp[1] // 128
                    if weights == "int4g" and shp[1] % 128 == 0
                    else 1
                )
                out["kernel_q4p"] = ("int4p", (shp[0], shp[1], shp[2] // 2))
                out["kernel_scale4p"] = (
                    "const", (shp[0], 2, ng, shp[2] // 2), 0.02 / 7, "bf16",
                )
            else:
                out["kernel_q"] = ("int8", shp)
                out["kernel_scale"] = (
                    "const", shp[:-2] + (1, shp[-1]), 0.02 / 127, "bf16",
                )
            return out
        if "embedding" in node and node["embedding"].shape[0] >= 4096:
            shp = tuple(node["embedding"].shape)
            out = {k: rewrite(v) for k, v in node.items() if k != "embedding"}
            out["embedding_q"] = ("int8", shp)
            out["embedding_scale"] = (
                "const", (shp[0], 1), 0.02 / 127, "bf16",
            )
            return out
        return {k: rewrite(v) for k, v in node.items()}

    return rewrite(struct)


def init_params_device(cfg, weights: str = "int4", seed: int = 0):
    """Synthetic int8/int4 serving tree generated ON DEVICE in one jitted
    program. The host-build path (init_params_host_*) costs ~20 min per
    process on this platform (single-threaded numpy gen + a slow relay
    transfer of the multi-GB tree); weight VALUES are
    throughput-irrelevant, so the bench generates random quantized
    leaves directly in HBM — no bf16 ever materializes (the Array.delete
    landmine) and nothing crosses the host link."""
    spec = _synth_spec(cfg, weights)
    is_leaf = lambda x: isinstance(x, tuple) and x and isinstance(x[0], str)
    leaves, treedef = jax.tree.flatten(spec, is_leaf=is_leaf)

    def gen(key):
        keys = jax.random.split(key, len(leaves))
        outs = []
        for k, sp in zip(keys, leaves):
            kind, shape = sp[0], sp[1]
            if kind == "randn":
                outs.append(
                    jax.random.normal(k, shape, jnp.bfloat16) * 0.02
                )
            elif kind == "int8":
                outs.append(
                    jax.random.randint(k, shape, -127, 128, jnp.int8)
                )
            elif kind == "int4p":
                outs.append(
                    jax.random.randint(k, shape, -128, 128, jnp.int8)
                )
            else:
                dt = jnp.bfloat16 if sp[3] == "bf16" else jnp.float32
                outs.append(jnp.full(shape, sp[2], dt))
        return jax.tree.unflatten(treedef, outs)

    return jax.jit(gen)(jax.random.PRNGKey(seed))


def synth_params(cfg, weights: str, seed: int = 0):
    """Synthetic serving tree for benches: device-side generation by
    default, HALVA_BENCH_PARAM_GEN=host forces the numpy path (exact
    structural twin; used when a host copy of the tree is needed)."""
    if weights == "bfloat16":
        return llava.init_params(jax.random.PRNGKey(seed), cfg, jnp.bfloat16)
    if os.environ.get("HALVA_BENCH_PARAM_GEN", "device") == "host":
        if weights == "int4g":  # grouped scales: device-side gen only
            return init_params_device(cfg, weights, seed)
        build = (
            init_params_host_int4 if weights == "int4"
            else init_params_host_int8
        )
        return build(cfg, seed)
    return init_params_device(cfg, weights, seed)


def make_inputs(cfg, batch):
    rng = np.random.RandomState(0)
    prompt_len = 48  # text part; splice adds 575
    ids = rng.randint(5, 30000, (batch, prompt_len)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    lens = np.full((batch,), prompt_len, np.int32)
    images = rng.randn(
        batch, 3, cfg.vision.image_size, cfg.vision.image_size
    ).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(images), jnp.asarray(lens)


SPEC_STATS = {}  # last run's speculative-decode stats (for the JSON)


def run_once(cfg, params, batch, inputs=None):
    # input tensors are prepared outside the timed region: a real eval
    # loop overlaps host image preprocessing with device decode
    # (halva_tpu/utils/prefetch.py), so steady-state throughput excludes
    # host-side input synthesis
    ids, images, lens = inputs or make_inputs(cfg, batch)
    # eos_id=-1 can never be generated (ids are non-negative), so every
    # row decodes the full token budget
    kv_mode = os.environ.get("HALVA_BENCH_KV", "int8")
    kv_quant = kv_mode if kv_mode in ("int8", "int4") else False
    spec_k = int(os.environ.get("HALVA_BENCH_SPEC", "0"))
    if spec_k >= 2:
        # prompt-lookup speculative greedy decode (ops/speculative.py).
        # NOTE on this synthetic bench: random-weight models emit cyclic
        # text, so acceptance here bounds the mechanism's overhead/win
        # shape, not a real caption workload's rate — the JSON reports
        # the realized tokens-per-verify-step next to the throughput.
        from halva_tpu.ops.speculative import generate_speculative

        tokens, num, stats = generate_speculative(
            params, cfg, ids, images, lens,
            max_new_tokens=DECODE_TOKENS, eos_id=-1,
            draft_k=spec_k, kv_quant=kv_quant,
        )
        SPEC_STATS.update(stats)
        return np.asarray(tokens)
    tokens, num = generate_greedy(
        params, cfg, ids, images, lens,
        max_new_tokens=DECODE_TOKENS, eos_id=-1,
        # int8 (default) | int4 (nibble-packed prompt KV) | off
        kv_quant=kv_quant,
    )
    # NOTE: on the axon relay platform block_until_ready does not actually
    # synchronize; a host readback is the only reliable fence, and it's
    # what a real eval loop does with the tokens anyway.
    return np.asarray(tokens)


def _fail(msg: str):
    print(
        json.dumps(
            {
                "metric": "chair500_eval_throughput",
                "value": 0.0,
                "unit": "imgs/sec",
                "vs_baseline": 0.0,
                "error": msg[:800],
            }
        )
    )
    sys.exit(1)


def _measure(cfg, params, batches):
    """(imgs_per_sec, batch, step_time) at the largest batch that fits."""
    last_err = None
    for batch in batches:
        try:
            inputs = tuple(
                jax.device_put(x) for x in make_inputs(cfg, batch)
            )
            _prog(f"batch {batch}: compile + warmup")
            run_once(cfg, params, batch, inputs)  # compile + warmup
            _prog(f"batch {batch}: warm, timing")
            iters = 3 if batch >= 4 else 4
            t0 = time.perf_counter()
            for _ in range(iters):
                run_once(cfg, params, batch, inputs)
            dt = (time.perf_counter() - t0) / iters
            _prog(f"batch {batch}: {batch / dt:.2f} imgs/s ({dt:.3f} s/step)")
            return batch / dt, batch, dt
        except Exception as e:  # OOM at this batch -> try smaller
            _prog(f"batch {batch}: failed ({str(e)[:200]})")
            last_err = e
            continue
    raise RuntimeError(str(last_err)[:500])


def main():
    cfg = pick_cfg()
    # serving config: weight-only int8 (per-channel), built host-side —
    # the production path for llava-7b on a single 16GB v5e chip. bf16
    # single-chip decode is weights-bound at batch 1 (measured 0.36
    # imgs/s = 1.45x baseline on this chip, 2026-08-16).
    weights = os.environ.get("HALVA_BENCH_WEIGHTS", "int4g")
    _prog(f"building {weights} params for {cfg.llm.num_layers}-layer preset")
    params = synth_params(cfg, weights)
    if weights in ("int4", "int4g"):
        # stacked-int4 LLM layers (ops/w4_matmul serving path): weight
        # HBM halves, buying batch 48-56 (measured 2026-08-17: b32 6.65,
        # b48 7.06, b56 7.10 imgs/s vs int8 b24 6.28). int4 prompt KV
        # (HALVA_BENCH_KV=int4) frees another ~4.5 GB at b56 — start
        # the ladder higher.
        batches = [56, 48, 32, 24, 16, 8, 4, 2, 1]
        if os.environ.get("HALVA_BENCH_KV", "int8") == "int4":
            # b80 measured BEST on the kv4 ladder (8.98 imgs/s vs b96
            # 8.80, b56 8.55 — rows4+W4A8, SERVING_LADDER.json); the
            # ladder is preference-ordered, first fit wins
            batches = [80, 96, 64] + batches
    elif weights == "int8":
        # batch 24 measured optimal on v5e (2026-08-16: b16 4.66, b24
        # 5.26, b32 4.05 imgs/s — W8A8 + int8 prompt-KV)
        batches = [24, 16, 8, 4, 2, 1]
    else:
        batches = [2, 1]
    # host-readback fence (block_until_ready no-ops on the axon relay)
    np.asarray(jax.tree.leaves(params)[0][:1])
    _prog("params on device")
    if os.environ.get("HALVA_BENCH_BATCH"):
        batches = [int(os.environ["HALVA_BENCH_BATCH"])]

    try:
        imgs_per_sec, batch, dt = _measure(cfg, params, batches)
    except RuntimeError as e:
        if weights in ("int8", "int4"):
            # safety net: re-exec as a fresh fallback process (int4 ->
            # int8 -> bf16). In-process fallback is unsafe here: device
            # memory from the quantized tree cannot be freed
            # (Array.delete is a no-op on this platform) and a doomed
            # alloc has crashed the TPU worker before.
            import subprocess

            nxt = "int8" if weights in ("int4", "int4g") else "bfloat16"
            env = dict(os.environ, HALVA_BENCH_WEIGHTS=nxt)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env
            )
            sys.exit(r.returncode)
        _fail(str(e))
        return

    print(
        json.dumps(
            {
                "metric": "chair500_eval_throughput",
                "value": round(imgs_per_sec, 4),
                "unit": "imgs/sec",
                # vs_baseline divides by an ASSUMED A100 number (the
                # reference publishes no throughput); the measured
                # number that stands on its own is tokens_per_sec
                "vs_baseline": round(
                    imgs_per_sec / A100_BASELINE_IMGS_PER_SEC, 3
                ),
                "measured_tokens_per_sec": round(
                    batch * DECODE_TOKENS / dt, 1
                ),
                "baseline_is_estimate": True,
                "detail": {
                    "model": os.environ.get(
                        "HALVA_BENCH_PRESET", "llava-v1.5-7b"
                    )
                    + " architecture",
                    "weights": weights
                    + (" (weight-only per-channel)" if weights == "int8" else ""),
                    "batch": batch,
                    "decode_tokens": DECODE_TOKENS,
                    "tokens_per_sec": round(batch * DECODE_TOKENS / dt, 1),
                    "step_time_s": round(dt, 3),
                    "baseline": "A100 bs=1 fp16 HF generate ~0.25 imgs/s",
                    "token_budget_note": (
                        "decodes HALVA_BENCH_TOKENS tokens/image with "
                        "no EOS exit; the reference CHAIR budget is "
                        "<=1024 NEW tokens with EOS exit "
                        "(model_vqa_loader.py:102-111) and real CHAIR "
                        "captions run ~100 tokens — 128 full-budget "
                        "tokens is the comparable steady-state load"
                    ),
                    "quality_evidence": (
                        "scripts/quant_quality.py on-chip at 7B shapes "
                        "(QUANT_QUALITY.json): int8 weights LOSSLESS "
                        "(top-1 agreement 1.0 vs bf16 oracle, prefill "
                        "KL 0.0035); int4 top-1 agreement 0.999 over "
                        "8x128 greedy steps (int4g/nf4: 1.0); "
                        "per-matmul rel err int4 15.7% (the RTN class "
                        "published as ~0.3-0.6 ppl at g128 on 7B "
                        "models, AWQ arXiv 2306.00978); fused-kernel-"
                        "vs-XLA exactness on the same int4 tree "
                        "(int4_xla mode: top-1 1.0); w4a8 prefill "
                        "top-1 0.999 (QUANT_QUALITY.json w4a8); int4 "
                        "prompt-KV top-1 0.999 (int4+int4KV row)"
                    ),
                    "backend": jax.default_backend(),
                    **(
                        {
                            "speculative": {
                                "draft_k": int(
                                    os.environ["HALVA_BENCH_SPEC"]
                                ),
                                **SPEC_STATS,
                                "note": (
                                    "prompt-lookup speculation on "
                                    "SYNTHETIC cyclic text; real-"
                                    "caption acceptance differs"
                                ),
                            }
                        }
                        if SPEC_STATS
                        else {}
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
