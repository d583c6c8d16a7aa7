"""Fixed-shape batched beam search over the split KV cache.

Completes the reference eval loaders' generation surface: every loader
exposes ``--num_beams`` and forwards it to HF ``generate``
(eval_hall/model_vqa_loader.py:106-111, model_chair_loader.py:127-131,
model_amber_loader.py:117-121). HALVA's published configs decode with
num_beams=1 (greedy — ops/generate.py), but a reference user switching
over must find the knob working, so this module implements HF
beam-search semantics (transformers 4.57 vectorized ``_beam_search``,
do_sample=False, early_stopping=False) the TPU way:

- ALL shapes static: B items expand to B*K rows after ONE shared
  prefill; candidates are a fixed top-2K slice of the (K*V) frontier;
  finished hypotheses live in a fixed (B, K) set kept sorted by
  penalized score. No Python control flow: one `lax.while_loop` whose
  carry is the whole search state.
- The prompt KV cache is computed ONCE at batch B and STAYS at B item
  rows — decode attention maps beam row r to prompt row r // K
  (llama.decode_step beam_k: einsum beam-fold in the XLA oracle,
  grid-static index maps in the fused Pallas kernel), so the dominant
  decode-time buffer is never duplicated K-fold in HBM. Only the small
  generated cache lives at B*K rows and is beam-reordered each step
  (gather on the batch dim by parent-beam index — the standard TPU
  cache-reorder beam step).
- HF-semantics notes kept bit-compatible (oracle-tested vs transformers
  on tiny random Llamas, tests/test_beam.py):
  * initial frontier scores are [0, -inf, ...] so step 1 fans out of
    beam 0 only;
  * a candidate "finishes" when its token IS eos or it hits the token
    budget (HF MaxLengthCriteria fires inside the loop — there is no
    separate finalize pass); only candidates ranked < K may finish;
  * a finished hypothesis INCLUDES its final token and scores
    sum_logprobs / generated_len**length_penalty with generated_len
    counting that token (HF `_update_finished_beams`:
    `(cur_len + 1 - decoder_prompt_len)`);
  * the next running frontier is the candidate top-K after finished
    candidates are demoted by -1e9 (HF
    `_get_running_beams_for_next_iteration`);
  * early_stopping=False done rule (HF `_check_early_stop_heuristic`):
    an item stops adding hypotheses when all K finished slots are
    filled AND the best running score / generated_len**length_penalty
    cannot strictly beat the worst finished score.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from halva_tpu.config import LlavaConfig
from halva_tpu.models import llama
from halva_tpu.ops.generate import (
    _cached_jit,
    _params_key,
    _prefill_impl,
    check_batch_divides,
    init_gen_cache_like,
    w4_pack_stamp,
)

Params = Dict[str, Any]

NEG_INF = -1.0e9


class BeamState(NamedTuple):
    step: jnp.ndarray        # () int32 — tokens emitted so far
    logits: jnp.ndarray      # (B*K, V) fp32 next-token logits
    seqs: jnp.ndarray        # (B, K, max_new) running beam tokens
    scores: jnp.ndarray      # (B, K) running sum logprobs
    gen_cache: Params        # (L, B*K, KVH, Sg, Dh) beam-ordered
    fin_tokens: jnp.ndarray  # (B, K, max_new) finished hypotheses
    fin_scores: jnp.ndarray  # (B, K) penalized scores, sorted desc
    fin_lens: jnp.ndarray    # (B, K) hypothesis token counts (incl. eos)
    fin_full: jnp.ndarray    # (B, K) slot holds a real hypothesis
    done: jnp.ndarray        # (B,) early-stop heuristic satisfied


def _beam_body_factory(cfg, k: int, max_new: int, eos_id: int,
                       length_penalty: float, allow_fused: bool):
    def body(st: BeamState, params, prompt_cache, prompt_seg, spliced_len):
        b = st.seqs.shape[0]
        v = st.logits.shape[-1]
        c = 2 * k
        logp = jax.nn.log_softmax(st.logits.astype(jnp.float32), axis=-1)
        frontier = (
            st.scores[:, :, None] + logp.reshape(b, k, v)
        ).reshape(b, k * v)

        cand_scores, cand_idx = jax.lax.top_k(frontier, c)  # (B, 2K)
        cand_parent = cand_idx // v
        cand_tok = (cand_idx % v).astype(jnp.int32)
        # a candidate finishes on eos OR on hitting the token budget
        # (HF MaxLengthCriteria fires for every candidate at max_length)
        hits = (cand_tok == eos_id) | (st.step + 1 >= max_new)
        rank = jnp.arange(c, dtype=jnp.int32)[None, :]

        # candidate sequences: parent's tokens + this token at slot step
        cand_seqs = jnp.take_along_axis(
            st.seqs, cand_parent[:, :, None], axis=1
        )  # (B, 2K, max_new)
        cand_seqs = jax.lax.dynamic_update_slice(
            cand_seqs, cand_tok[:, :, None], (0, 0, st.step)
        )

        # ---- finished-set merge (HF _update_finished_beams) -----------
        gen_len = (st.step + 1).astype(jnp.float32)
        pen_scores = cand_scores / gen_len ** length_penalty
        fin_ok = hits & (rank < k) & ~st.done[:, None]
        merged_scores = jnp.concatenate(
            [st.fin_scores, jnp.where(fin_ok, pen_scores, NEG_INF)], axis=1
        )
        merged_tokens = jnp.concatenate([st.fin_tokens, cand_seqs], axis=1)
        merged_lens = jnp.concatenate(
            [st.fin_lens,
             jnp.broadcast_to(st.step + 1, (b, c)).astype(jnp.int32)],
            axis=1,
        )
        merged_full = jnp.concatenate([st.fin_full, fin_ok], axis=1)
        top_scores, top_idx = jax.lax.top_k(merged_scores, k)
        fin_tokens = jnp.take_along_axis(
            merged_tokens, top_idx[:, :, None], axis=1
        )
        fin_lens = jnp.take_along_axis(merged_lens, top_idx, axis=1)
        fin_full = jnp.take_along_axis(merged_full, top_idx, axis=1)
        fin_scores = top_scores

        # ---- next running frontier (finished candidates demoted) ------
        run_scores = cand_scores + hits.astype(jnp.float32) * NEG_INF
        new_scores, keep = jax.lax.top_k(run_scores, k)  # (B, K)
        new_parent = jnp.take_along_axis(cand_parent, keep, axis=1)
        new_seqs = jnp.take_along_axis(
            cand_seqs, keep[:, :, None], axis=1
        )

        # done items stop evolving (their rows still run the model; the
        # final state simply ignores them)
        new_scores = jnp.where(st.done[:, None], st.scores, new_scores)
        new_seqs = jnp.where(st.done[:, None, None], st.seqs, new_seqs)
        new_parent = jnp.where(
            st.done[:, None], jnp.arange(k, dtype=jnp.int32)[None, :],
            new_parent,
        )

        # ---- early_stopping=False done rule ----------------------------
        best_attainable = new_scores[:, 0] / gen_len ** length_penalty
        worst_fin = jnp.where(
            jnp.all(fin_full, axis=1),
            jnp.min(fin_scores, axis=1),
            NEG_INF,
        )
        done = st.done | ~(best_attainable > worst_fin)

        # ---- advance the model one step --------------------------------
        parent_rows = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * k + new_parent
        ).reshape(-1)  # (B*K,) global gen-cache rows
        gen_cache = jax.tree.map(
            lambda a: jnp.take(a, parent_rows, axis=1), st.gen_cache
        )
        flat_tok = jax.lax.dynamic_slice(
            new_seqs.reshape(b * k, max_new), (0, st.step), (b * k, 1)
        )[:, 0]
        pos = jnp.repeat(spliced_len, k) + st.step
        embeds = llama.embed(params["llm"], flat_tok[:, None])
        logits, gen_cache = llama.decode_step(
            params["llm"], cfg, embeds, pos, prompt_cache, prompt_seg,
            gen_cache, st.step, allow_fused=allow_fused, beam_k=k,
        )
        return BeamState(
            st.step + 1, logits, new_seqs, new_scores, gen_cache,
            fin_tokens, fin_scores, fin_lens, fin_full, done,
        )

    return body


def _beam_impl(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,
    images: jnp.ndarray,
    prompt_lengths: jnp.ndarray,
    max_new_tokens: int,
    eos_id: int,
    num_beams: int,
    length_penalty: float,
    attn_impl: str,
    kv_quant,
    allow_fused: bool = True,
):
    b = input_ids.shape[0]
    k = num_beams

    first_tok, first_logits, spliced_len, prompt_cache, prompt_seg = (
        _prefill_impl(
            params, cfg, input_ids, images, prompt_lengths,
            max_new_tokens, attn_impl, kv_quant,
        )
    )
    del first_tok
    # one shared prefill at batch B; the read-only prompt cache STAYS at
    # B item rows (decode_step beam_k maps beam row -> item row), so
    # --num-beams costs K * gen-cache, not K * prompt-cache, in HBM

    gen_cache = init_gen_cache_like(
        cfg.llm, b * k, max_new_tokens, prompt_cache
    )

    init = BeamState(
        step=jnp.int32(0),
        # prefill logits replicated across beams; scores [0, -inf, ...]
        # make step 1 fan out of beam 0 only (HF init)
        logits=jnp.repeat(first_logits.astype(jnp.float32), k, axis=0),
        seqs=jnp.zeros((b, k, max_new_tokens), jnp.int32),
        scores=jnp.tile(
            jnp.where(
                jnp.arange(k, dtype=jnp.float32) == 0, 0.0, NEG_INF
            )[None, :],
            (b, 1),
        ),
        gen_cache=gen_cache,
        fin_tokens=jnp.zeros((b, k, max_new_tokens), jnp.int32),
        fin_scores=jnp.full((b, k), NEG_INF, jnp.float32),
        fin_lens=jnp.zeros((b, k), jnp.int32),
        fin_full=jnp.zeros((b, k), bool),
        done=spliced_len == 0,  # dead pad rows never search
    )

    body = _beam_body_factory(
        cfg.llm, k, max_new_tokens, eos_id, length_penalty, allow_fused
    )

    # the token-budget iteration finishes every still-running item
    # inside the body (hits == True for all candidates), so there is no
    # separate finalize pass
    final = jax.lax.while_loop(
        lambda st: (st.step < max_new_tokens) & ~jnp.all(st.done),
        lambda st: body(st, params, prompt_cache, prompt_seg, spliced_len),
        init,
    )

    # finished slots are sorted desc by penalized score: slot 0 wins
    tokens = final.fin_tokens[:, 0]  # (B, max_new)
    hyp_len = final.fin_lens[:, 0]  # incl. a trailing eos (HF keeps it)
    # num counts CONTENT tokens — a trailing eos is excluded so the
    # count contract matches generate() (generate.py counts != eos_id);
    # `tokens` still carries the eos (HF sequences keep it, and the
    # padding below writes eos there anyway)
    last = jnp.take_along_axis(
        tokens, jnp.maximum(hyp_len - 1, 0)[:, None], axis=1
    )[:, 0]
    num = hyp_len - ((hyp_len > 0) & (last == eos_id)).astype(jnp.int32)
    # pad beyond the hypothesis with eos so decode_tokens trims
    tokens = jnp.where(
        jnp.arange(max_new_tokens, dtype=jnp.int32)[None, :]
        < hyp_len[:, None],
        tokens, jnp.int32(eos_id),
    )
    return tokens, num


_BEAM_JITS: Dict[Any, Any] = {}


def generate_beam(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,      # (B, S) right-padded, -200 image sentinel
    images: jnp.ndarray,         # (B, 3, H, W)
    prompt_lengths: jnp.ndarray, # (B,) valid token counts (pre-splice)
    max_new_tokens: int,
    eos_id: int,
    num_beams: int,
    length_penalty: float = 1.0,
    attn_impl: str = "auto",
    kv_quant=False,
    mesh: Optional[Mesh] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-search decode; returns (tokens (B, max_new), num_generated).

    `tokens` holds the best finished hypothesis per item (its eos, when
    it ended with one, included — HF sequences keep it); rows are padded
    with eos_id past the hypothesis. `num_generated` counts CONTENT
    tokens (a trailing eos excluded) — the same contract as
    generate(), so callers can slice tokens[i, :num[i]] from either
    entry point. One jit program (prefill + beam loop, see
    ops/generate.py on why phases never split). Rows with
    prompt_length 0 are dead pad rows that return empty hypotheses.

    HBM: the prompt KV cache stays at B item rows (decode_step beam_k);
    beams add only the (B*K)-row gen cache, so --num-beams at serving
    batch sizes does not multiply the dominant decode-time buffer.

    mesh: a {data: N} mesh runs shard_map eval data parallelism —
    a batch item's K beams always live on ONE shard (the search needs
    no cross-item communication), each shard runs the complete
    single-chip beam program on its slice, tokens are bit-identical to
    the single-device program. model > 1 is not supported for beams
    (use greedy/sampling TP, or --num-chunks process fanout).

    HF-semantics parity (generate(num_beams=K, do_sample=False,
    early_stopping=False, length_penalty=L)) is oracle-tested in
    tests/test_beam.py. num_beams=1 callers should use generate() —
    greedy is cheaper than a K=1 beam loop.
    """
    if num_beams < 2:
        raise ValueError("generate_beam needs num_beams >= 2; use "
                         "ops.generate.generate for greedy/sampling")
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        raise ValueError(
            "beam search supports {data: N} meshes only; tensor-"
            "parallel beams are not implemented"
        )
    stamp = w4_pack_stamp(params)
    if stamp > 1:
        # a tp-packed int4 tree dequants to block-permuted output
        # channels outside its manual-TP shard_map (see generate())
        raise ValueError(
            f"params are int4-packed for manual TP={stamp} "
            f"(w4_pack_tp); beam search has no TP mode — requantize "
            f"with quantize_params_int4_host(tp=1)"
        )
    key = (
        cfg, max_new_tokens, eos_id, num_beams, length_penalty,
        attn_impl, kv_quant, input_ids.shape, images.shape, mesh,
        _params_key(params),
    )

    def make():
        def impl(p, ids, im, lens):
            return _beam_impl(
                p, cfg, ids, im, lens, max_new_tokens, eos_id,
                num_beams, length_penalty, attn_impl, kv_quant,
            )

        if mesh is None:
            return jax.jit(impl)
        dp = mesh.shape.get("data", 1)
        check_batch_divides(input_ids.shape[0], dp)
        pspec = jax.tree.map(lambda _: P(), params)
        return jax.jit(jax.shard_map(
            impl,
            mesh=mesh,
            in_specs=(pspec, P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data")),
            check_vma=False,
        ))

    fn = _cached_jit(_BEAM_JITS, key, make)
    return fn(params, input_ids, images, prompt_lengths)
