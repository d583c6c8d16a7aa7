"""Continuous batching: EOS-freed rows refill from a pending queue.

The one-shot decode program (ops/generate._decode_impl) drains whole
batches — its while_loop exits when ALL rows hit EOS, so the longest
caption gates 56-80 rows; real CHAIR caption lengths vary ~30-150
tokens (round-4 verdict item 5, the biggest serving lever after the
kernel wins). The reference never faces this because it decodes bs=1
(eval_hall/model_vqa_loader.py:102-111) — and pays 36x for it.

TPU-native design — all shapes static, the hot loop byte-identical to
the one-shot program:

- The decode runs in CHUNKS of `chunk` steps: one jitted program per
  dispatch, early-exiting when every resident row is done. Between
  chunks the host reads the (B,) done mask, harvests finished rows'
  tokens, and REFILLS freed slots from the queue.
- Rows run at PER-ROW local steps over a RING-buffered gen cache: the
  KV write column stays one scalar (global_step % Sg) — the exact
  dynamic_update_slice of the lockstep program, no scatter in the hot
  loop — and per-row validity is ring arithmetic folded into the
  (B, Sg) gen_valid mask the fused Pallas kernel already consumes
  (models/llama.decode_step gen_valid_override/write_slot). A slot s is
  valid for row r iff its latest write step g(s) = G - ((G - s) mod Sg)
  >= row_start[r]; a row's writing lifetime is <= max_new <= Sg, so its
  own live tokens never collide, and previous occupants' stale KV sits
  below row_start — invisible.
- Refill = one prefill dispatch on an R-row bucket (R from REFILL_SIZES
  so programs are reused; short queues pad with dead rows) + a batch-dim
  scatter of the small prompt cache into the resident state. Cost ~R/B
  of one prompt-cache write, amortized over the rows' whole lifetime.
- Per-row `budget` bounds each row's emission (the synthetic-workload
  EOS analogue and the max_new cap in one mechanism).

Greedy, rope-position models, single-device (the headline serving
config) — guarded. Token parity with the one-shot program is pinned by
tests/test_continuous.py.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from halva_tpu.config import LlavaConfig
from halva_tpu.models import llama
from halva_tpu.ops.generate import _cached_jit, _params_key, _prefill_phase

Params = Dict[str, Any]


class CBState(NamedTuple):
    global_step: jnp.ndarray  # () int32 — steps executed so far
    row_start: jnp.ndarray  # (B,) global step of each row's first token
    base_len: jnp.ndarray  # (B,) spliced prompt length
    cur: jnp.ndarray  # (B,) next token to emit
    done: jnp.ndarray  # (B,) bool
    budget: jnp.ndarray  # (B,) max tokens for this row
    n_emitted: jnp.ndarray  # (B,) tokens written so far
    tokens: jnp.ndarray  # (B, cap) local-indexed emissions
    prompt_cache: Params
    prompt_seg: jnp.ndarray  # (B, Sp)
    gen_cache: Params


def _ring_valid(global_now, row_start, sg):
    """(B, Sg) gen validity after the write at column global_now % Sg:
    slot s holds the KV of global step g(s) = G - ((G - s) mod Sg);
    valid iff that step is within the row's current occupancy."""
    s = jnp.arange(sg, dtype=jnp.int32)[None, :]
    g = global_now - jnp.mod(global_now - s, sg)
    return g >= row_start[:, None]


def _chunk_body(params, cfg, st: CBState, eos_id: int):
    sg = st.gen_cache["k"].shape[3]
    b = st.cur.shape[0]
    g = st.global_step

    tok = jnp.where(st.done, jnp.int32(eos_id), st.cur)
    local = jnp.clip(g - st.row_start, 0, st.tokens.shape[1] - 1)
    rows = jnp.arange(b)
    old = st.tokens[rows, local]
    tokens = st.tokens.at[rows, local].set(
        jnp.where(st.done, old, tok)
    )
    n_emitted = st.n_emitted + jnp.where(st.done, 0, 1)
    done = st.done | (tok == eos_id) | (n_emitted >= st.budget)

    pos = st.base_len + (g - st.row_start)
    embeds = llama.embed(params["llm"], tok[:, None])
    logits, new_gen = llama.decode_step(
        params["llm"],
        cfg.llm,
        embeds,
        pos,
        st.prompt_cache,
        st.prompt_seg,
        st.gen_cache,
        g,
        gen_valid_override=_ring_valid(g, st.row_start, sg),
        write_slot=jnp.mod(g, sg),
    )
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return st._replace(
        global_step=g + 1,
        cur=nxt,
        done=done,
        n_emitted=n_emitted,
        tokens=tokens,
        gen_cache=new_gen,
    )


_CHUNK_JITS: Dict[Any, Any] = {}
_SCATTER_JITS: Dict[Any, Any] = {}


def _chunk_fn(params, cfg, st: CBState, eos_id: int, chunk: int):
    key = (
        cfg, eos_id, chunk, st.cur.shape, st.tokens.shape,
        st.prompt_seg.shape, tuple(sorted(st.gen_cache)),
        st.gen_cache["k"].shape, _params_key(params),
    )

    def make():
        def impl(p, s0):
            t_end = s0.global_step + chunk

            def cond(s):
                return (s.global_step < t_end) & ~jnp.all(s.done)

            return jax.lax.while_loop(
                cond, lambda s: _chunk_body(p, cfg, s, eos_id), s0
            )

        return jax.jit(impl, donate_argnums=(1,))

    return _cached_jit(_CHUNK_JITS, key, make)


def _seq_pad(cache: Params, like: Params) -> Params:
    """Pad a smaller-Sp prompt cache up to the resident cache's
    sequence dims (bf16/int8 values+scales and nibble-packed int4
    variants — the seq dim index differs per leaf kind, so pad every
    dim to `like`'s EXCEPT the batch dim (dim 1): a sub-batch refill
    keeps its R rows, the scatter writes them into `slots`. Padding the
    batch dim too was the latent bug the refill-bucket cap exposed —
    the CPU suite's tiny batches only ever produced full-batch
    refills). Padded seq slots stay masked by segment 0; scales pad
    with 1."""
    out = {}
    for k, v in cache.items():
        tgt = like[k].shape
        assert len(tgt) == v.ndim, (k, v.shape, tgt)
        widths = [(0, t - s) for s, t in zip(v.shape, tgt)]
        widths[1] = (0, 0)  # batch dim: scatter handles the rows
        assert all(w >= 0 for _, w in widths), (k, v.shape, tgt)
        if any(w for _, w in widths):
            v = jnp.pad(
                v, widths,
                constant_values=1 if k.endswith("_scale") else 0,
            )
        out[k] = v
    return out


def _scatter_fn(st: CBState, r: int, treedefs_key):
    """jit: write an R-row prefill result into state rows `slots`."""
    key = (
        "scatter", r, st.cur.shape, st.prompt_seg.shape,
        st.tokens.shape, treedefs_key,
    )

    def make():
        def impl(s: CBState, slots, pc_small, seg, ft, sl, budget):
            pcache = {
                k: v.at[:, slots].set(pc_small[k])
                for k, v in s.prompt_cache.items()
            }
            return s._replace(
                row_start=s.row_start.at[slots].set(s.global_step),
                base_len=s.base_len.at[slots].set(sl),
                cur=s.cur.at[slots].set(ft),
                done=s.done.at[slots].set(sl == 0),
                budget=s.budget.at[slots].set(
                    jnp.where(sl == 0, 0, budget)
                ),
                n_emitted=s.n_emitted.at[slots].set(0),
                tokens=s.tokens.at[slots].set(0),
                prompt_cache=pcache,
                prompt_seg=s.prompt_seg.at[slots].set(seg),
            )

        return jax.jit(impl, donate_argnums=(0,))

    return _cached_jit(_SCATTER_JITS, key, make)


class Request(NamedTuple):
    ids: np.ndarray  # (S,) prompt token ids (unpadded)
    image: Any  # (3, H, W) array OR a zero-arg callable returning one
    budget: int  # max new tokens for this row


class ContinuousEngine:
    """Host orchestrator: resident B-row state + pending queue.

    run(requests) returns (tokens (cap,), n_emitted) per request, in
    request order; each row's tokens are bit-identical to a one-shot
    generate of that prompt with the same budget (test_continuous)."""

    REFILL_FRACS = (1.0, 0.5, 0.25, 0.125)

    def __init__(
        self,
        params: Params,
        cfg: LlavaConfig,
        batch: int,
        max_new_tokens: int,
        eos_id: int,
        prompt_pad: int,
        chunk: int = 16,
        kv_quant=False,
        attn_impl: str = "auto",
        max_refill: Optional[int] = None,
    ):
        if batch % 8:
            raise ValueError("batch must divide into refill buckets of 8")
        self.params, self.cfg = params, cfg
        self.b, self.cap = batch, max_new_tokens
        self.eos, self.chunk = eos_id, chunk
        self.kv_quant, self.attn_impl = kv_quant, attn_impl
        self.prompt_pad = prompt_pad  # token pad length for prompts
        # refill bucket cap: an R-row refill prefill's output cache is
        # co-resident with the FULL engine state while the scatter
        # writes it in — at 7B serving shapes a whole-batch (f=1.0)
        # refill OOM'd the chip (b56 Sp~640 int4: ~5 G state + ~3.6 G
        # tree + ~5 G refill cache > 15.75 G). Capping R bounds the
        # transient at ~R/B of the state size; the initial fill just
        # runs as ceil(B/R) prefill calls (each still a fat matmul).
        if max_refill is None:
            max_refill = int(os.environ.get("HALVA_CB_REFILL", "16"))
        self.refill_sizes = sorted(
            {
                max(8, min(max_refill, int(batch * f)))
                for f in self.REFILL_FRACS
            },
            reverse=True,
        )
        # state template from the prefill's own cache structure: the
        # resident Sp then matches padded refills exactly
        dummy = jax.eval_shape(
            lambda: _prefill_shapes(
                params, cfg, batch, prompt_pad, max_new_tokens,
                attn_impl, kv_quant,
            )
        )
        (_, _, _, pc_s, seg_s) = dummy
        self.sp = seg_s.shape[1]
        gen_cache = llama.init_gen_cache(
            cfg.llm, batch, max_new_tokens, dtype=jnp.bfloat16,
            quantized="k_scale" in pc_s or "k4" in pc_s,
        )
        zeros = lambda s: jnp.zeros(s.shape, s.dtype)  # noqa: E731
        self.state = CBState(
            global_step=jnp.int32(0),
            row_start=jnp.zeros((batch,), jnp.int32),
            base_len=jnp.zeros((batch,), jnp.int32),
            cur=jnp.full((batch,), eos_id, jnp.int32),
            done=jnp.ones((batch,), bool),
            budget=jnp.zeros((batch,), jnp.int32),
            n_emitted=jnp.zeros((batch,), jnp.int32),
            tokens=jnp.zeros((batch, max_new_tokens), jnp.int32),
            prompt_cache=jax.tree.map(zeros, pc_s),
            prompt_seg=jnp.zeros(seg_s.shape, jnp.int32),
            gen_cache=gen_cache,
        )
        self.stats = {"chunks": 0, "refills": 0, "steps": 0}

    def _prefill(self, reqs: List[Request], r: int):
        """Prefill an r-row bucket (padding with dead rows) and return
        device arrays ready for the scatter."""
        s = self.prompt_pad
        ids = np.zeros((r, s), np.int32)
        lens = np.zeros((r,), np.int32)
        imgs = np.zeros(
            (
                r, 3,
                self.cfg.vision.image_size,
                self.cfg.vision.image_size,
            ),
            np.float32,
        )
        budget = np.zeros((r,), np.int32)
        for i, rq in enumerate(reqs):
            n = min(len(rq.ids), s)
            ids[i, :n] = rq.ids[:n]
            lens[i] = n
            # lazy images: the runner hands callables backed by a
            # prefetch pool so JPEG decode overlaps device decode
            imgs[i] = rq.image() if callable(rq.image) else rq.image
            budget[i] = min(rq.budget, self.cap)
        ft, _, sl, pc, seg = _prefill_phase(
            self.params, self.cfg, jnp.asarray(ids), jnp.asarray(imgs),
            jnp.asarray(lens), self.cap, self.attn_impl, self.kv_quant,
        )
        return (
            _seq_pad(pc, self.state.prompt_cache), seg, ft, sl,
            jnp.asarray(budget),
        )

    def run(self, requests: Sequence[Request]):
        results: List[Optional[Tuple[np.ndarray, int]]] = (
            [None] * len(requests)
        )
        pending = list(range(len(requests)))
        pending.reverse()  # pop() serves request order
        occupant = [-1] * self.b  # request index per slot
        free = list(range(self.b))

        chunk_jit = None
        while pending or any(o >= 0 for o in occupant):
            # refill: largest bucket that fits the free slots; pad the
            # bucket with dead rows when the queue runs short
            while free and pending:
                r = next(
                    (
                        n for n in self.refill_sizes
                        if n <= len(free)
                        and (len(pending) >= n or n == min(self.refill_sizes))
                    ),
                    None,
                )
                if r is None:
                    break
                take = [pending.pop() for _ in range(min(r, len(pending)))]
                reqs = [requests[i] for i in take]
                slots = [free.pop() for _ in range(r)]
                pc, seg, ft, sl, budget = self._prefill(reqs, r)
                tdk = jax.tree_util.tree_structure(
                    self.state.prompt_cache
                )
                fn = _scatter_fn(self.state, r, tdk)
                self.state = fn(
                    self.state, jnp.asarray(np.asarray(slots, np.int32)),
                    pc, seg, ft, sl, budget,
                )
                for j, req_i in enumerate(take):
                    occupant[slots[j]] = req_i
                # bucket-padding rows stay dead; release their slots
                for j in range(len(take), r):
                    free.append(slots[j])
                self.stats["refills"] += 1
            if all(o < 0 for o in occupant):
                break

            if chunk_jit is None:
                chunk_jit = _chunk_fn(
                    self.params, self.cfg, self.state, self.eos,
                    self.chunk,
                )
            g0 = int(self.state.global_step)
            self.state = chunk_jit(self.params, self.state)
            self.stats["chunks"] += 1
            self.stats["steps"] += int(self.state.global_step) - g0

            done = np.asarray(self.state.done)
            n_em = np.asarray(self.state.n_emitted)
            toks = None
            for slot in range(self.b):
                if occupant[slot] >= 0 and done[slot]:
                    if toks is None:
                        toks = np.asarray(self.state.tokens)
                    results[occupant[slot]] = (
                        toks[slot].copy(), int(n_em[slot])
                    )
                    occupant[slot] = -1
                    free.append(slot)
        return results


def _prefill_shapes(params, cfg, b, s, cap, attn_impl, kv_quant):
    """eval_shape helper: the prefill outputs at the resident shapes."""
    ids = jnp.zeros((b, s), jnp.int32)
    imgs = jnp.zeros(
        (b, 3, cfg.vision.image_size, cfg.vision.image_size), jnp.float32
    )
    lens = jnp.zeros((b,), jnp.int32)
    from halva_tpu.ops.generate import _prefill_impl

    return _prefill_impl(
        params, cfg, ids, imgs, lens, cap, attn_impl, kv_quant
    )
