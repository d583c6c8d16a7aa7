"""Speculative greedy decoding via prompt-lookup (n-gram) drafting.

Beyond-reference serving feature: the reference evaluates with plain HF
greedy/sampling generate (eval_hall/model_vqa_loader.py:102-111). Here,
each decode iteration verifies K candidate tokens in ONE pass over the
model (llama.verify_step), so the prompt KV cache — the dominant HBM
stream of batched decode at serving shapes (docs/PERF.md decode
attribution) — is read once per accepted RUN of tokens instead of once
per token.

Greedy-EXACTNESS by construction: a draft token is only accepted when
it equals the model's own argmax at its position, so the emitted
sequence is bit-identical to plain greedy decoding REGARDLESS of draft
quality (tests/test_speculative.py pins parity against
ops.generate.generate_greedy). Bad drafts only cost speed: every verify
step still yields >= 1 token (the model's argmax at the first position
— the standard "bonus token"), so the worst case degenerates to plain
decode with a K-token step.

Drafts come from prompt-lookup decoding (n-gram continuation — the HF
`prompt_lookup_num_tokens` idea, arXiv 2402.01528 class): find the most
recent earlier occurrence of the current (prev, cur) bigram in
[prompt || generated-so-far] and propose the K-1 tokens that followed
it. Image captions repeat entities and phrasing, which is exactly where
prompt lookup shines; no draft model, no extra weights, fully
data-dependent-shape-free (everything is fixed-shape masks and gathers
inside one jit).

Greedy only (temperature 0 — the HALVA eval default). Sampling would
need rejection sampling to stay distribution-exact; out of scope.
RoPE/no-sliding-window configs only (verify_step's contract); callers
should fall back to ops.generate.generate for anything else.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from halva_tpu.config import LlavaConfig
from halva_tpu.models import llama
from halva_tpu.ops.generate import (
    _cached_jit,
    _params_key,
    _prefill_impl,
    init_gen_cache_like,
    w4_pack_stamp,
)

Params = Dict[str, Any]


class SpecState(NamedTuple):
    out: jnp.ndarray  # (B, max_new + K) emitted tokens, eos-id filled
    out_count: jnp.ndarray  # (B,) tokens emitted (== gen-cache length)
    cur: jnp.ndarray  # (B,) next token to emit/verify
    done: jnp.ndarray  # (B,) bool
    gen_cache: Params
    steps: jnp.ndarray  # () int32 — verify iterations executed


def ngram_draft(
    hist: jnp.ndarray,  # (B, T) [prompt ids || out buffer]
    valid: jnp.ndarray,  # (B, T) bool — positions holding real tokens
    prev: jnp.ndarray,  # (B,) token before cur in the context
    cur: jnp.ndarray,  # (B,) current (not-yet-cached) token
    self_pos: jnp.ndarray,  # (B,) index of cur's bigram start, -1 if n/a
    n_draft: int,
) -> jnp.ndarray:
    """(B, n_draft) proposed continuations: the tokens that followed the
    most recent earlier occurrence of the (prev, cur) bigram in `hist`.
    Rows with no match (or invalid continuation slots) fall back to
    repeating `cur` — always SOUND, only ever a speed question (see
    module docstring)."""
    b, t = hist.shape
    pos = jnp.arange(t - 1, dtype=jnp.int32)[None, :]
    hit = (
        (hist[:, :-1] == prev[:, None])
        & (hist[:, 1:] == cur[:, None])
        & valid[:, :-1]
        & valid[:, 1:]
        & (pos != self_pos[:, None])  # the query bigram itself
    )
    best = jnp.max(jnp.where(hit, pos, -1), axis=1)  # (B,) latest match
    has = best >= 0
    idx = (
        best[:, None]
        + 2
        + jnp.arange(n_draft, dtype=jnp.int32)[None, :]
    )  # continuation slots
    idx_c = jnp.clip(idx, 0, t - 1)
    cont = jnp.take_along_axis(hist, idx_c, axis=1)
    cont_ok = jnp.take_along_axis(valid, idx_c, axis=1) & (idx <= t - 1)
    return jnp.where(
        has[:, None] & cont_ok, cont, cur[:, None]
    ).astype(jnp.int32)


def _spec_decode_impl(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,  # (B, S) pre-splice ids (draft history)
    prompt_lengths: jnp.ndarray,  # (B,)
    first_tok: jnp.ndarray,
    spliced_len: jnp.ndarray,
    prompt_cache: Params,
    prompt_seg: jnp.ndarray,
    max_new_tokens: int,
    eos_id: int,
    draft_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b, s = input_ids.shape
    kq = draft_k  # tokens verified per step = 1 (cur) + (K-1) drafts
    out_pad = max_new_tokens + kq
    # cache rows rounded to a 128-multiple: the fused verify kernel
    # (llama._verify_step_w4) carries the whole-Sg gen blocks on the
    # lane-constrained block dims; validity derives from gen_len, so
    # over-allocation is correctness-neutral
    cache_pad = -(-out_pad // 128) * 128
    gen_cache = init_gen_cache_like(cfg.llm, b, cache_pad, prompt_cache)

    init = SpecState(
        out=jnp.full((b, out_pad), jnp.int32(eos_id)),
        out_count=jnp.zeros((b,), jnp.int32),
        cur=first_tok,
        done=spliced_len == 0,  # dead pad rows (see generate())
        gen_cache=gen_cache,
        steps=jnp.int32(0),
    )
    prompt_valid = (
        jnp.arange(s, dtype=jnp.int32)[None, :] < prompt_lengths[:, None]
    ) & (input_ids >= 0)  # image sentinel (-200) never matches drafts
    iota_out = jnp.arange(out_pad, dtype=jnp.int32)[None, :]

    def cond(st: SpecState):
        return (st.steps < max_new_tokens) & ~jnp.all(
            st.done | (st.out_count >= max_new_tokens)
        )

    def body(st: SpecState):
        live = ~st.done
        tok0 = jnp.where(live, st.cur, jnp.int32(eos_id))
        # emit cur at out_count (done rows: buffer already eos-filled)
        w0 = (iota_out == st.out_count[:, None]) & live[:, None]
        out = jnp.where(w0, tok0[:, None], st.out)
        done0 = st.done | (tok0 == eos_id)

        # ---- draft K-1 continuations of [.., prev, cur]
        hist = jnp.concatenate([input_ids, out], axis=1)
        valid = jnp.concatenate(
            [prompt_valid, iota_out <= st.out_count[:, None]], axis=1
        )  # out slot out_count now holds cur
        prev = jnp.where(
            st.out_count > 0,
            jnp.take_along_axis(
                out,
                jnp.clip(st.out_count - 1, 0, out_pad - 1)[:, None],
                axis=1,
            )[:, 0],
            jnp.take_along_axis(
                input_ids,
                jnp.clip(prompt_lengths - 1, 0, s - 1)[:, None],
                axis=1,
            )[:, 0],
        )
        self_pos = jnp.where(
            st.out_count > 0, s + st.out_count - 1, jnp.int32(-1)
        )
        draft = ngram_draft(
            hist, valid, prev, tok0, self_pos, kq - 1
        )  # (B, K-1)

        # ---- one verify pass over [cur, draft...]
        cand = jnp.concatenate([tok0[:, None], draft], axis=1)  # (B, K)
        embeds = llama.embed(params["llm"], cand)
        logits, new_gen = llama.verify_step(
            params["llm"],
            cfg.llm,
            embeds,
            spliced_len + st.out_count,
            prompt_cache,
            prompt_seg,
            st.gen_cache,
            st.out_count,
        )
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, K)

        # ---- longest accepted prefix (greedy-exact by construction)
        match = draft == g[:, :-1]  # (B, K-1)
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        acc_i = jnp.arange(kq - 1, dtype=jnp.int32)[None, :]
        is_eos = (draft == eos_id) & (acc_i < m[:, None])
        has_eos = jnp.any(is_eos, axis=1)
        first_eos = jnp.argmax(is_eos, axis=1).astype(jnp.int32)
        m_eff = jnp.where(has_eos, first_eos + 1, m)  # keep the eos draft

        # emit accepted drafts at out_count+1 .. out_count+m_eff
        wpos = st.out_count[:, None] + 1 + acc_i  # (B, K-1)
        keep = (acc_i < m_eff[:, None]) & live[:, None]
        onehot = (
            iota_out[:, None, :] == wpos[:, :, None]
        ) & keep[:, :, None]  # (B, K-1, out_pad)
        out = jnp.where(
            jnp.any(onehot, axis=1),
            jnp.sum(jnp.where(onehot, draft[:, :, None], 0), axis=1),
            out,
        )
        bonus = jnp.take_along_axis(g, m[:, None], axis=1)[:, 0]
        cur_new = jnp.where(
            has_eos | done0, jnp.int32(eos_id), bonus
        )
        adv = jnp.where(live & ~ (tok0 == eos_id), 1 + m_eff, 0)
        return SpecState(
            out=out,
            out_count=st.out_count + adv,
            cur=cur_new,
            done=done0 | (has_eos & live),
            gen_cache=new_gen,
            steps=st.steps + 1,
        )

    fin = jax.lax.while_loop(cond, body, init)
    tokens = fin.out[:, :max_new_tokens]
    # num: tokens before the first eos (greedy's count — after a row's
    # eos every later slot is eos-filled, so cumprod matches generate())
    alive = jnp.cumprod((tokens != eos_id).astype(jnp.int32), axis=1)
    num = jnp.sum(alive, axis=1)
    emitted = jnp.sum(jnp.minimum(fin.out_count, max_new_tokens))
    return tokens, num, fin.steps, emitted


_SPEC_JITS: Dict[Any, Any] = {}


def generate_speculative(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,
    images: jnp.ndarray,
    prompt_lengths: jnp.ndarray,
    max_new_tokens: int,
    eos_id: int,
    draft_k: int = 4,
    attn_impl: str = "auto",
    kv_quant=False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, Any]]:
    """Prompt-lookup speculative GREEDY decode. Returns
    (tokens (B, max_new), num_generated (B,), stats) where stats carries
    {"verify_steps": int, "emitted_tokens": int} — tokens/verify_steps
    is the realized mean accepted run length (1.0 = no speculation win).

    Token-exact vs generate_greedy (see module docstring). draft_k is
    the verify width: 1 current token + draft_k-1 lookup continuations.
    Single-device entry (the bench/serving path); mesh decode keeps the
    plain generate path for now.
    """
    if draft_k < 2:
        raise ValueError("draft_k must be >= 2 (1 means plain greedy)")
    if (
        cfg.llm.position_embedding != "rope"
        or cfg.llm.sliding_window is not None
    ):
        raise NotImplementedError(
            "speculative decode: RoPE / no-sliding-window configs only "
            "— use ops.generate.generate"
        )
    if w4_pack_stamp(params) > 1:
        raise ValueError(
            "params are int4-packed for manual TP; speculative decode "
            "is single-device — requantize with tp=1"
        )
    key = (
        cfg, max_new_tokens, eos_id, draft_k, attn_impl, kv_quant,
        input_ids.shape, images.shape, _params_key(params),
    )

    def make():
        def impl(p, ids, im, lens):
            ft, _, sl, pc, ps = _prefill_impl(
                p, cfg, ids, im, lens, max_new_tokens, attn_impl,
                kv_quant,
            )
            return _spec_decode_impl(
                p, cfg, ids, lens, ft, sl, pc, ps,
                max_new_tokens, eos_id, draft_k,
            )

        return jax.jit(impl)

    fn = _cached_jit(_SPEC_JITS, key, make)
    tokens, num, steps, emitted = fn(
        params, input_ids, images, prompt_lengths
    )
    stats = {
        "verify_steps": int(steps),
        "emitted_tokens": int(emitted),
    }
    return tokens, num, stats
