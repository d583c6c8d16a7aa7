"""Batched KV-cached greedy decoding.

Replaces the reference's batch-size-1 HF `generate` eval loop
(eval_hall/model_vqa_loader.py:67 asserts bs==1; one process per GPU) with a
single batched, jit-compiled decode: bucketed prefill fills the cache for
the whole batch, then a `lax.while_loop` emits tokens until every row hit
EOS or the token budget. This is the designed source of the >=2x A100
imgs/sec eval target (BASELINE.md).

All shapes are static: prompts are right-padded to a bucket length, the
cache is sized prompt_bucket + max_new_tokens. Per-row prompt lengths drive
positions and cache segment ids.

Memory layout: the KV cache is split into a read-only PROMPT cache
(produced as prefill scan outputs — no zero-init + in-place-update copy
pair) and a small GENERATED cache (max_new slots, loop-carried). On a
16GB chip running llava-7b in bf16 the weights alone are 13.4GB; this
split is what makes batch > 1 decode fit. Decode attention runs one
softmax over the concatenated (tiny) logits of both caches — no KV
concat is ever materialized.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from halva_tpu.config import LlavaConfig
from halva_tpu.constants import IMAGE_TOKEN_INDEX
from halva_tpu.models import llama, llava

Params = Dict[str, Any]


def _cache_constraint(cache: Params, kv_heads: int, mesh: Mesh) -> Params:
    """Pin KV-cache shardings under a mesh: batch over "data", heads over
    "model" (when it divides), everything else replicated. Applied inside
    the jit so XLA's propagation cannot replicate the (large) cache."""
    model_n = mesh.shape.get("model", 1)
    hax = "model" if model_n > 1 and kv_heads % model_n == 0 else None
    out = {}
    for kk, vv in cache.items():
        if kk.endswith("_scale") and vv.ndim == 5:
            # int4 even/odd scales (L, B, 2, H, S/2): heads on dim 3
            spec = P(None, "data", None, hax, None)
        elif vv.ndim == 5:  # (L, B, H, S, D) values (incl. k4/v4 packed)
            spec = P(None, "data", hax, None, None)
        elif vv.ndim == 4:  # scales (L, B, H, S)
            spec = P(None, "data", hax, None)
        else:
            spec = P()
        out[kk] = jax.lax.with_sharding_constraint(
            vv, NamedSharding(mesh, spec)
        )
    return out


class GenState(NamedTuple):
    step: jnp.ndarray  # () int32 — decode step counter
    tokens: jnp.ndarray  # (B, max_new) emitted tokens
    cur: jnp.ndarray  # (B,) last emitted token
    lengths: jnp.ndarray  # (B,) spliced prompt lengths
    done: jnp.ndarray  # (B,) bool
    gen_cache: Params  # (L, B, max_new, KVH, Dh) generated-token KV


def _prefill_impl(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,
    images: jnp.ndarray,
    prompt_lengths: jnp.ndarray,
    max_new_tokens: int,
    attn_impl: str,
    kv_quant: bool = False,
    tp: int = 1,
    tp_axis: Optional[str] = None,
):
    b, s = input_ids.shape
    t = cfg.num_image_tokens
    seg = (
        jnp.arange(s, dtype=jnp.int32)[None, :] < prompt_lengths[:, None]
    ).astype(jnp.int32)

    feats = llava.encode_images(params, cfg, images)
    sp = llava.splice_image_tokens(params, cfg, input_ids, feats, seg)
    s_prompt = sp.embeds.shape[1]  # S + T - 1

    hidden, prompt_cache = llama.prefill(
        params["llm"],
        cfg.llm,
        sp.embeds,
        sp.segment_ids,
        sp.positions,
        cache_dtype=jnp.bfloat16,
        attn_impl=attn_impl,
        quantize_cache=kv_quant,
        tp=tp,
        tp_axis=tp_axis,
    )

    has_img = jnp.any(input_ids == IMAGE_TOKEN_INDEX, axis=1)
    spliced_len = prompt_lengths + jnp.where(has_img, t - 1, 0)

    last_idx = jnp.clip(spliced_len - 1, 0, s_prompt - 1)
    last_hidden = jnp.take_along_axis(
        hidden, last_idx[:, None, None], axis=1
    )
    first_logits = llama.lm_logits(params["llm"], cfg.llm, last_hidden)[:, 0]
    first_tok = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)

    return first_tok, first_logits, spliced_len, prompt_cache, sp.segment_ids


_JIT_CACHE_MAX = 16


def _params_key(params) -> Any:
    """Cache-key component capturing everything about `params` that the
    built executable bakes in besides leaf shapes/dtypes (which jit
    retraces on): the pytree STRUCTURE (a bf16 tree and an int8/int4
    tree at the same batch shapes must not share a shard_map fn whose
    in_specs were derived from the other tree), the trace-time quant
    routing globals (set_w8a8/set_w4a8 flip which dense kernel the
    trace embeds, invisible to shapes), and the decode env knobs the
    kernels read at TRACE time (attention route, multi-row grid,
    scoped-VMEM block planning, beam dot-fold) — a process that flips
    one of these between calls at identical shapes must not reuse the
    stale executable (the round-4 flaky-TP-parity bug class)."""
    import os

    from halva_tpu.ops import quant

    return (
        jax.tree_util.tree_structure(params),
        quant.w8a8_enabled(),
        quant.w4a8_enabled(),
        os.environ.get("HALVA_DECODE_ATTN", "fused"),
        os.environ.get("HALVA_DECODE_ROWS", "4"),
        os.environ.get("HALVA_SCOPED_VMEM_MB", "16"),
        os.environ.get("HALVA_BEAM_DOT", "fold"),
    )


def w4_pack_stamp(params) -> int:
    """The tp an int4 tree was nibble-packed for
    (quantize_params_int4_host(tp=...)); 1 for unpacked/non-dict trees.
    Shared by every decode entry point (generate, generate_beam) — the
    refusal rules differ per entry, the stamp read must not."""
    return int(params.get("w4_pack_tp", 1)) if isinstance(params, dict) else 1


def check_batch_divides(n_rows: int, dp: int) -> None:
    """Mesh decode shards rows over the "data" axis; refuse loudly when
    they do not divide (shard_map would otherwise error opaquely)."""
    if n_rows % dp != 0:
        raise ValueError(
            f"batch {n_rows} must be a multiple of the mesh data axis "
            f"size ({dp})"
        )


def init_gen_cache_like(cfg_llm, rows, max_new_tokens: int, prompt_cache,
                        tp: int = 1):
    """Generated-token cache matching the prompt cache's quantization:
    int8 gen for int8/int4 prompt caches (halves the gen-side decode
    read traffic — 3.8 GB/step bf16 at b56 Sg=128), the prompt dtype
    otherwise. One shared rule for greedy/sampling and beam decode."""
    quant = "k_scale" in prompt_cache
    return llama.init_gen_cache(
        cfg_llm, rows, max_new_tokens,
        dtype=prompt_cache["k"].dtype if not quant else jnp.bfloat16,
        quantized=quant, tp=tp,
    )


def _cached_jit(cache: Dict[Any, Any], key, make):
    """Bounded insertion-order jit cache: long-lived serving processes
    that vary (batch, bucket, max_new) would otherwise accumulate
    compiled executables forever (round-2 advisor finding). Eviction
    drops the oldest entry; jax's own executable cache may still serve
    a retrace cheaply."""
    fn = cache.get(key)
    if fn is None:
        while len(cache) >= _JIT_CACHE_MAX:
            cache.pop(next(iter(cache)))
        fn = make()
        cache[key] = fn
    return fn


_PREFILL_JITS: Dict[Any, Any] = {}


def _prefill_phase(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,
    images: jnp.ndarray,
    prompt_lengths: jnp.ndarray,
    max_new_tokens: int,
    attn_impl: str,
    kv_quant: bool = False,
):
    """Standalone prefill jit — tests and prefill-only timing. The
    production path is generate(): splitting prefill/decode into two
    programs lets XLA assign mismatched boundary layouts to the KV cache
    (whole-cache relayout copies, broken donation, brittle interplay
    with persistently-cached executables — see generate's docstring)."""
    key = (
        cfg, max_new_tokens, attn_impl, kv_quant,
        input_ids.shape, images.shape, _params_key(params),
    )
    def make():
        def impl(p, ids, im, lens):
            return _prefill_impl(
                p, cfg, ids, im, lens, max_new_tokens, attn_impl, kv_quant
            )

        return jax.jit(impl)

    fn = _cached_jit(_PREFILL_JITS, key, make)
    return fn(params, input_ids, images, prompt_lengths)


def _select_token(logits, temperature, top_p, key):
    """Greedy (temperature==0) or nucleus sampling (reference generate
    surface: --temperature/--top_p, model_vqa_loader.py:106-108)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p; find the cutoff logit
        keep = cum - probs < top_p
        cutoff = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits >= cutoff, logits, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _decode_impl(
    params: Params,
    cfg: LlavaConfig,
    first_tok: jnp.ndarray,
    spliced_len: jnp.ndarray,
    prompt_cache: Params,
    prompt_seg: jnp.ndarray,
    max_new_tokens: int,
    eos_id: int,
    temperature: float = 0.0,
    top_p: float = 1.0,
    rng: Optional[jnp.ndarray] = None,
    mesh: Optional[Mesh] = None,
    allow_fused: bool = True,
    tp: int = 1,
    tp_axis: Optional[str] = None,
):
    b = first_tok.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    gen_cache = init_gen_cache_like(
        cfg.llm, b, max_new_tokens, prompt_cache, tp=tp
    )
    if mesh is not None:
        gen_cache = _cache_constraint(gen_cache, cfg.llm.kv_heads, mesh)

    init = GenState(
        step=jnp.int32(0),
        tokens=jnp.zeros((b, max_new_tokens), jnp.int32),
        cur=first_tok,
        lengths=spliced_len,
        # dead rows (prompt_length 0 => spliced_len 0, segment ids all
        # zero) start done and emit eos immediately: the tail-batch pad
        # rows cost no extra decode steps and never tile a real row
        # (BatchedGenerator pads with zero rows)
        done=spliced_len == 0,
        gen_cache=gen_cache,
    )

    def cond(st: GenState):
        return (st.step < max_new_tokens) & ~jnp.all(st.done)

    def body(st: GenState):
        tok = jnp.where(st.done, jnp.int32(eos_id), st.cur)
        tokens = jax.lax.dynamic_update_slice(
            st.tokens, tok[:, None], (0, st.step)
        )
        done = st.done | (tok == eos_id)

        pos = st.lengths + st.step
        embeds = llama.embed(params["llm"], tok[:, None])
        logits, new_gen = llama.decode_step(
            params["llm"],
            cfg.llm,
            embeds,
            pos,
            prompt_cache,
            prompt_seg,
            st.gen_cache,
            st.step,
            allow_fused=allow_fused,
            tp=tp,
            tp_axis=tp_axis,
        )
        step_key = jax.random.fold_in(rng, st.step)
        nxt = _select_token(logits, temperature, top_p, step_key)
        return GenState(
            st.step + 1, tokens, nxt, st.lengths, done, new_gen
        )

    final = jax.lax.while_loop(cond, body, init)
    num = jnp.sum(
        (final.tokens != eos_id)
        & (
            jnp.arange(max_new_tokens, dtype=jnp.int32)[None, :]
            < final.step
        ),
        axis=1,
    )
    return final.tokens, num


_DECODE_JITS: Dict[Any, Any] = {}


def _decode_phase(
    params: Params,
    cfg: LlavaConfig,
    first_tok: jnp.ndarray,
    spliced_len: jnp.ndarray,
    prompt_cache: Params,
    prompt_seg: jnp.ndarray,
    max_new_tokens: int,
    eos_id: int,
    temperature: float = 0.0,
    top_p: float = 1.0,
    rng: Optional[jnp.ndarray] = None,
):
    """Standalone decode jit — tests only; see _prefill_phase's note."""
    key = (
        cfg, max_new_tokens, eos_id, temperature, top_p,
        first_tok.shape, prompt_seg.shape,
        "k_scale" in prompt_cache, rng is None, _params_key(params),
    )
    def make():
        def impl(p, ft, sl, pc, ps, r):
            return _decode_impl(
                p, cfg, ft, sl, pc, ps, max_new_tokens, eos_id,
                temperature, top_p, r,
            )

        return jax.jit(impl, donate_argnums=(3,))

    fn = _cached_jit(_DECODE_JITS, key, make)
    return fn(params, first_tok, spliced_len, prompt_cache, prompt_seg, rng)


_GENERATE_JITS: Dict[Any, Any] = {}


def build_generate_impl(
    cfg: LlavaConfig,
    max_new_tokens: int,
    eos_id: int,
    attn_impl: str = "auto",
    kv_quant: bool = False,
    temperature: float = 0.0,
    top_p: float = 1.0,
    mesh: Optional[Mesh] = None,
    manual_tp: bool = False,
):
    """The un-jitted one-program generate body
    (params, ids, images, lens, rng) -> (tokens, num_generated).

    With a mesh whose "model" axis > 1 (tensor parallelism) there are
    two modes:

    - manual_tp=True (the default route when
      partition.manual_tp_ready): the body is built for jax.shard_map —
      weights arrive pre-split (eval_shmap_pspecs), the model runs its
      LOCAL heads with per-layer psums over "model", and the fused
      Pallas kernels STAY on (each shard runs them on its head slice).
    - manual_tp=False (propagation fallback — packed-int4/NF4 trees,
      indivisible head counts): Pallas kernels are bypassed (attn_impl
      forced "xla", allow_fused False — a Pallas custom call cannot be
      SPMD-partitioned) and KV-cache shardings are pinned
      batch-over-"data", heads-over-"model"; XLA inserts collectives.

    Exported so __graft_entry__ can AOT-lower the FULL generate program
    on a virtual mesh."""
    tp_n = mesh.shape.get("model", 1) if mesh is not None else 1
    prop_tp = tp_n > 1 and not manual_tp
    eff_attn = "xla" if prop_tp else attn_impl
    allow_fused = not prop_tp
    tp = tp_n if manual_tp else 1
    tp_axis = "model" if (manual_tp and tp_n > 1) else None
    # shard_map modes replicate the rng over the mesh; per-data-shard
    # sampling must decorrelate it (identical prompts on different
    # shards would otherwise draw IDENTICAL tokens). Model shards keep
    # the same key — their logits are psum-identical and must sample in
    # lockstep.
    shard_rng = (
        mesh is not None and not prop_tp and temperature > 0.0
    )

    def impl(p, ids, im, lens, r):
        if shard_rng:
            r = jax.random.fold_in(r, jax.lax.axis_index("data"))
        ft, fl, sl, pc, ps = _prefill_impl(
            p, cfg, ids, im, lens, max_new_tokens, eff_attn, kv_quant,
            tp=tp, tp_axis=tp_axis,
        )
        # cache constraints only make sense for the TP sharding-
        # propagation program; in the shard_map modes the body runs
        # per-shard where every mesh axis is manual
        if prop_tp:
            pc = _cache_constraint(pc, cfg.llm.kv_heads, mesh)
        if temperature > 0.0:
            ft = _select_token(
                fl, temperature, top_p,
                jax.random.fold_in(r, 0x7FFFFFFF),
            )
        return _decode_impl(
            p, cfg, ft, sl, pc, ps, max_new_tokens, eos_id,
            temperature, top_p, r,
            mesh=mesh if prop_tp else None, allow_fused=allow_fused,
            tp=tp, tp_axis=tp_axis,
        )

    return impl


def _make_sharded_generate(params, cfg, impl, mesh: Mesh,
                           manual_tp: bool = False):
    """jit the generate body over a mesh.

    model == 1 (pure eval data parallelism — the TPU-native replacement
    for the reference's one-process-per-GPU fanout): shard_map over
    "data" with replicated weights. Each data shard runs the complete
    single-chip program — including the fused Pallas decode kernel —
    on its batch slice; zero cross-device communication, and each
    shard's decode while_loop exits as soon as ITS rows hit EOS.

    model > 1, manual_tp (13B+ class, weights too big per chip):
    shard_map over {data, model} with weights pre-split by
    partition.eval_shmap_pspecs and in-model psums (impl built with
    tp/tp_axis). Pallas kernels run per shard on local heads; the only
    decode-loop communication is the two per-layer (B_local, 1, D)
    psums.

    model > 1, not manual_tp (packed-int4/NF4 trees, indivisible
    heads): sharding-propagation jit with TP in_shardings from
    partition.eval_param_shardings; XLA inserts the collectives."""
    from halva_tpu.parallel import partition

    dp = mesh.shape.get("data", 1)
    tp = mesh.shape.get("model", 1) > 1
    if not tp:
        pspec = jax.tree.map(lambda _: P(), params)
        shmapped = jax.shard_map(
            impl,
            mesh=mesh,
            in_specs=(pspec, P("data"), P("data"), P("data"), P()),
            out_specs=(P("data"), P("data")),
            check_vma=False,
        )
        return jax.jit(shmapped), dp
    if manual_tp:
        pspecs = partition.eval_shmap_pspecs(params, mesh)
        shmapped = jax.shard_map(
            impl,
            mesh=mesh,
            in_specs=(pspecs, P("data"), P("data"), P("data"), P()),
            out_specs=(P("data"), P("data")),
            check_vma=False,
        )
        return jax.jit(shmapped), dp
    in_sh = (
        partition.eval_param_shardings(params, mesh),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P()),
    )
    return jax.jit(impl, in_shardings=in_sh), dp


def generate(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,  # (B, S) right-padded, -200 image sentinel
    images: jnp.ndarray,  # (B, 3, H, W)
    prompt_lengths: jnp.ndarray,  # (B,) valid token counts (pre-splice)
    max_new_tokens: int,
    eos_id: int,
    attn_impl: str = "auto",
    temperature: float = 0.0,
    top_p: float = 1.0,
    rng: Optional[jnp.ndarray] = None,
    kv_quant: bool = False,
    mesh: Optional[Mesh] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens (B, max_new), num_generated (B,)).

    Prefill + decode run as ONE jit program. They used to be two jits
    with the KV cache crossing the boundary; XLA assigns each program's
    entry/exit layouts independently, chose a permuted physical layout
    for the head-major int8 cache on one side only, and the decode
    program paid a whole-cache relayout copy (compile OOM at b24:
    16.97/15.75G). Pinning boundary Formats worked within one process
    but is brittle against persistently-cached executables from older
    builds; a single program has no boundary to disagree over — and the
    cache/donation bookkeeping disappears with it. The split phases
    remain available (scripts/profile_decode.py) for diagnostics.

    kv_quant: False = bf16 prompt cache; True | "int8" = int8 values +
    per-(token, head) scales (halves decode KV HBM traffic);
    "int4" = nibble-packed token pairs (llama._quantize_kv4) — halves
    it again; the generated cache is int8 whenever the prompt cache is
    quantized.

    temperature 0 = greedy (the reference's do_sample=temperature>0
    convention); otherwise nucleus sampling with `top_p`. Rows stop at
    EOS; finished rows keep emitting eos_id (callers trim). Rows with
    prompt_length 0 are DEAD rows: they emit eos immediately (the
    batched runner pads tail batches with them).

    mesh: run the decode sharded across a {data[, model]} device mesh —
    the slice-level eval parallelism replacing the reference's
    one-process-per-GPU fanout (eval_hall/model_vqa_loader.py:19-27,
    SURVEY.md §2.5 eval-DP). Batch must divide the "data" axis. Greedy
    tokens are bit-identical to the single-device program (CPU-mesh
    parity test: tests/test_generate_mesh.py).

    NOTE: the first sampled/greedy token comes from the prefill phase
    argmax; under sampling the first generated token is also sampled.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    from halva_tpu.parallel import partition

    # manual shard_map TP keeps the Pallas kernels on; HALVA_TP_IMPL=
    # propagate forces the sharding-propagation fallback for A/B. One
    # shared decision with BatchedGenerator's weight placement.
    manual_tp = partition.manual_tp_route(params, cfg, mesh)
    stamp = w4_pack_stamp(params)
    if stamp > 1 and not (
        manual_tp and mesh is not None and mesh.shape.get("model") == stamp
    ):
        # a tp-packed int4 tree dequants to BLOCK-PERMUTED output
        # channels on any global (non-shard_map) consumer — refuse
        # loudly instead of generating garbage
        raise ValueError(
            f"params are int4-packed for manual TP={stamp} "
            f"(w4_pack_tp) but this call would run "
            f"{'propagation' if mesh is not None else 'single-device'}"
            f" — requantize with quantize_params_int4_host(tp=1) or "
            f"pass a mesh with model={stamp} and HALVA_TP_IMPL=shmap"
        )
    key = (
        cfg, max_new_tokens, eos_id, attn_impl, kv_quant, temperature,
        top_p, input_ids.shape, images.shape, mesh, manual_tp,
        # stamp is read (not traced) by the refusal check above and by
        # shard-slice layout assumptions: tp=1- and tp=2-packed trees
        # share a treedef, and their () int leaf never retraces a jit —
        # without the stamp in the key a packed-for-2 tree could reuse
        # an executable built for a packed-for-1 tree
        stamp,
        _params_key(params),
    )

    def make():
        impl = build_generate_impl(
            cfg, max_new_tokens, eos_id, attn_impl, kv_quant,
            temperature, top_p, mesh, manual_tp=manual_tp,
        )
        if mesh is None:
            return jax.jit(impl)
        fn, dp = _make_sharded_generate(
            params, cfg, impl, mesh, manual_tp=manual_tp
        )
        check_batch_divides(input_ids.shape[0], dp)
        return fn

    fn = _cached_jit(_GENERATE_JITS, key, make)
    return fn(params, input_ids, images, prompt_lengths, rng)


def generate_greedy(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,
    images: jnp.ndarray,
    prompt_lengths: jnp.ndarray,
    max_new_tokens: int,
    eos_id: int,
    attn_impl: str = "auto",
    kv_quant: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decoding (the HALVA eval default: temperature 0)."""
    return generate(
        params, cfg, input_ids, images, prompt_lengths,
        max_new_tokens, eos_id, attn_impl, kv_quant=kv_quant,
    )


def decode_tokens(
    tokens,  # (B, max_new) numpy
    num_generated,
    tokenizer,
    eos_id: int,
    stop_strs=(),
):
    """Host-side detokenize + stop-string trim (reference
    KeywordsStoppingCriteria semantics, llava/mm_utils.py:73-104)."""
    import numpy as np

    outs = []
    tokens = np.asarray(tokens)
    for row in tokens:
        ids = []
        for tid in row.tolist():
            if tid == eos_id:
                break
            ids.append(tid)
        text = tokenizer.decode(ids, skip_special_tokens=True)
        for sstr in stop_strs:
            idx = text.find(sstr)
            if idx != -1:
                text = text[:idx]
        outs.append(text.strip())
    return outs
