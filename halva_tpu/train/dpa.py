"""Data-augmented Phrase Alignment (DPA) loss — the HALVA objective.

Math parity with the reference trainer (llava/train/halva_trainer.py):
- per-token logps: log_softmax gather at label ids, shifted for a decoder
  (`cal_batch_logp`, :392-409);
- phrase accumulation: sum of token logps per phrase-sign id
  (`accumulate_logps`, :411-419) — the reference loops over
  torch.unique(signs); here it's one masked segment-sum over a static
  MAX_PHRASES axis (identical values, TPU-friendly shapes);
- alignment: mean over (batch x present-phrase) of
  log(1 + exp(neg_phrase_logp - pos_phrase_logp)) (:567-568), including the
  reference's log(2) contribution for rows lacking a given phrase id (its
  unique() is batch-global);
- KL regularizer on held-out instruction data: sum over ref tokens of
  p_ref * (log p_ref - log p_policy), fp32 softmax, divided by batch size
  (:580-590); total = alignment + alpha * KL (:590).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from halva_tpu.constants import IGNORE_INDEX

MAX_PHRASES = 16  # static upper bound on <MASK> spans per answer


def _batch_constrainer(mesh, batch_axis_index: int = 0):
    """Pin the batch dim to the "data" mesh axis inside the loss.

    Without this, XLA's SPMD propagation loses the batch sharding
    through the chunk reshape/moveaxis and REPLICATES the chunked-loss
    lm_head matmul on every chip, then all-reduces full-global-batch
    f32[B, chunk, V] tensors (524 MB each at 7B recipe shapes) every
    chunk iteration — measured on the compiled 8-device HLO via
    scripts/comm_model.py. Returns identity when mesh is None or has no
    sharded "data" axis."""
    if mesh is None or mesh.shape.get("data", 1) <= 1:
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec as P

    def constrain(x):
        spec = [None] * x.ndim
        spec[batch_axis_index] = "data"
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec))
        )

    return constrain


def per_token_logps(
    logits: jnp.ndarray,  # (B, S, V) fp32
    labels: jnp.ndarray,  # (B, S)
) -> jnp.ndarray:
    """Shifted per-token log-probabilities (B, S-1); positions whose label
    is IGNORE_INDEX still produce a (meaningless) value — mask downstream,
    exactly like the reference which zeroes ignore labels before gather."""
    labels = labels[:, 1:]
    logits = logits[:, :-1]
    safe = jnp.where(labels == IGNORE_INDEX, 0, labels)
    lsm = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(lsm, safe[..., None], axis=-1)[..., 0]


def accumulate_phrase_logps(
    logps: jnp.ndarray,  # (B, S-1) already masked by loss mask
    signs: jnp.ndarray,  # (B, S-1) 0 = no phrase, k = phrase id
    max_phrases: int = MAX_PHRASES,
) -> jnp.ndarray:
    """(B, MAX_PHRASES): column k-1 = sum of logps where signs == k."""
    ids = jnp.arange(1, max_phrases + 1, dtype=signs.dtype)
    onehot = signs[:, :, None] == ids[None, None, :]  # (B, S-1, K)
    return jnp.einsum(
        "bs,bsk->bk", logps, onehot.astype(logps.dtype)
    )


def alignment_loss(
    pos_logps: jnp.ndarray,  # (B, S-1)
    neg_logps: jnp.ndarray,
    pos_labels: jnp.ndarray,  # (B, S-1) shifted labels
    neg_labels: jnp.ndarray,
    pos_signs: jnp.ndarray,  # (B, S-1) shifted signs
    neg_signs: jnp.ndarray,
    max_phrases: int = MAX_PHRASES,
) -> jnp.ndarray:
    """Phrase-level contrastive loss (scalar, fp32).

    The present-phrase column set is derived from `pos_signs` ONLY. This is
    deliberate: the reference calls `accumulate_logps(pos_logps, pos_sign)`
    and `accumulate_logps(neg_logps, neg_sign)` independently
    (halva_trainer.py:564-565) and then subtracts the two (B, K) tensors —
    which only type-checks when unique(pos_signs) == unique(neg_signs).
    HALVA pairs guarantee that by construction (each <MASK> span exists in
    both answers; enforced host-side by HallDataset's sign pairing), and
    the reference would raise a shape error otherwise, so there is no
    reachable configuration where the sets differ.
    """
    pos_mask = (pos_labels != IGNORE_INDEX).astype(jnp.float32)
    neg_mask = (neg_labels != IGNORE_INDEX).astype(jnp.float32)
    pos = accumulate_phrase_logps(
        pos_logps * pos_mask, jnp.maximum(pos_signs, 0), max_phrases
    )
    neg = accumulate_phrase_logps(
        neg_logps * neg_mask, jnp.maximum(neg_signs, 0), max_phrases
    )
    # phrase ids present anywhere in the batch = the reference's
    # torch.unique(signs)[1:] column set
    ids = jnp.arange(1, max_phrases + 1, dtype=pos_signs.dtype)
    present = jnp.any(
        jnp.maximum(pos_signs, 0)[:, :, None] == ids[None, None, :],
        axis=(0, 1),
    )  # (K,)
    elem = jnp.log1p(jnp.exp(neg - pos))  # (B, K)
    num = jnp.sum(elem * present[None, :].astype(elem.dtype))
    denom = pos.shape[0] * jnp.maximum(
        jnp.sum(present.astype(jnp.float32)), 1.0
    )
    return num / denom


def kl_divergence(
    policy_logits: jnp.ndarray,  # (B, S, V) fp32, on ref batch
    ref_logits: jnp.ndarray,  # (B, S, V) fp32, frozen model, stop-grad'd
    ref_labels: jnp.ndarray,  # (B, S)
) -> jnp.ndarray:
    """KL(ref || policy) over supervised ref tokens, summed, / batch.

    Matches the reference exactly (halva_trainer.py:580-588): the mask is
    the *shifted* label tensor, applied to unshifted-position logits? No —
    the reference slices logits[:, :-1] and labels[:, 1:] first, then
    computes softmax KL on those; we take pre-sliced inputs and slice here.
    """
    p_logits = policy_logits[:, :-1]
    r_logits = jax.lax.stop_gradient(ref_logits[:, :-1])
    labels = ref_labels[:, 1:]
    mask = (labels != IGNORE_INDEX).astype(jnp.float32)

    r_logp = jax.nn.log_softmax(r_logits.astype(jnp.float32), axis=-1)
    p_logp = jax.nn.log_softmax(p_logits.astype(jnp.float32), axis=-1)
    r_prob = jnp.exp(r_logp)
    div = jnp.sum(r_prob * (r_logp - p_logp), axis=-1)  # (B, S-1)
    div = jnp.sum(div * mask)
    return div / policy_logits.shape[0]


class DPALossParts(NamedTuple):
    total: jnp.ndarray
    alignment: jnp.ndarray
    divergence: jnp.ndarray


# --------------------------------------------------------------------------
# Chunked (vocab-streaming) variants — the 7B memory recipe.
#
# The straight implementations above materialize (B, S, 32000) fp32 logits
# for FOUR forwards (pos, neg, policy-on-ref, frozen-on-ref) plus their
# log_softmax intermediates: >2GB per batch row at S=2048 — more than the
# activation headroom left on a 16GB v5e chip next to 7B weights. The
# chunked path takes final HIDDEN states (B, S, D — 16MB/row in bf16),
# projects each sequence chunk through lm_head inside a rematerialized
# lax.scan, and reduces immediately; peak live logits = one (B, c, V)
# chunk in fwd AND bwd. Identical math (log_softmax is per-position).
# --------------------------------------------------------------------------


def _chunk_seq(x: jnp.ndarray, chunk: int, fill=0):
    """(B, S, ...) -> (n, B, chunk, ...) zero/fill-padded to a multiple."""
    b, s = x.shape[:2]
    n = -(-s // chunk)
    pad = n * chunk - s
    if pad:
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
        x = jnp.pad(x, widths, constant_values=fill)
    x = x.reshape((b, n, chunk) + x.shape[2:])
    return jnp.moveaxis(x, 1, 0)


def per_token_logps_chunked(
    logits_fn,  # hidden chunk (B, c, D) -> fp32 logits (B, c, V)
    hidden: jnp.ndarray,  # (B, S, D)
    labels: jnp.ndarray,  # (B, S)
    chunk: int = 256,
    mesh=None,
) -> jnp.ndarray:
    """Shifted per-token logps (B, S-1); equals
    per_token_logps(logits_fn(hidden), labels) without the (B, S, V)
    materialization. `mesh` pins batch-over-"data" sharding through the
    chunk scan (see _batch_constrainer)."""
    cb = _batch_constrainer(mesh, 0)
    cb1 = _batch_constrainer(mesh, 1)  # scan xs: (n, B, chunk, ...)
    hid = hidden[:, :-1]
    lab = labels[:, 1:]
    b, sm1 = lab.shape
    hs = cb1(_chunk_seq(hid, chunk))
    ls = cb1(_chunk_seq(lab, chunk, fill=IGNORE_INDEX))

    def body(_, xs):
        hc, lc = xs
        logits = cb(logits_fn(cb(hc)))
        safe = jnp.where(lc == IGNORE_INDEX, 0, lc)
        lsm = jax.nn.log_softmax(logits, axis=-1)
        lp = jnp.take_along_axis(lsm, safe[..., None], axis=-1)[..., 0]
        return None, cb(lp)

    _, lps = jax.lax.scan(jax.checkpoint(body), None, (hs, ls))
    return cb(jnp.moveaxis(lps, 0, 1).reshape(b, -1)[:, :sm1])


def kl_divergence_chunked(
    logits_fn,
    policy_hidden: jnp.ndarray,  # (B, S, D)
    ref_hidden: jnp.ndarray,  # (B, S, D) frozen model (stop-grad'd here)
    ref_labels: jnp.ndarray,  # (B, S)
    chunk: int = 256,
    mesh=None,
    denom=None,  # loss divisor; default = row count (packed rows hold
    # several samples, so the packed path passes n_samples instead)
) -> jnp.ndarray:
    """KL(ref || policy) over supervised ref tokens, summed, / batch —
    equals kl_divergence() on the full logits. lm_head is shared between
    policy and frozen model (LoRA never touches lm_head: reference
    find_all_linear_names excludes it, train_halva.py:156-169)."""
    cb = _batch_constrainer(mesh, 0)
    cb1 = _batch_constrainer(mesh, 1)
    p_hid = policy_hidden[:, :-1]
    r_hid = jax.lax.stop_gradient(ref_hidden[:, :-1])
    lab = ref_labels[:, 1:]
    ps = cb1(_chunk_seq(p_hid, chunk))
    rs = cb1(_chunk_seq(r_hid, chunk))
    ls = cb1(_chunk_seq(lab, chunk, fill=IGNORE_INDEX))

    def body(acc, xs):
        pc, rc, lc = xs
        mask = (lc != IGNORE_INDEX).astype(jnp.float32)
        p_logp = jax.nn.log_softmax(cb(logits_fn(cb(pc))), axis=-1)
        r_logp = jax.lax.stop_gradient(
            jax.nn.log_softmax(cb(logits_fn(cb(rc))), axis=-1)
        )
        div = jnp.sum(jnp.exp(r_logp) * (r_logp - p_logp), axis=-1)
        return acc + jnp.sum(div * mask), None

    total, _ = jax.lax.scan(
        jax.checkpoint(body), jnp.zeros((), jnp.float32), (ps, rs, ls)
    )
    if denom is None:
        denom = policy_hidden.shape[0]
    return total / denom


# --------------------------------------------------------------------------
# Packed variants (train/pack.py): rows hold several documents; per-token
# sample_ids (1-based) and neg_flags key the phrase accumulation instead
# of the row index. Math parity with the unpacked loss is asserted by
# tests/test_packed_dpa.py.
# --------------------------------------------------------------------------


def packed_phrase_logps(
    logps: jnp.ndarray,  # (R, S-1) shifted per-token logps
    labels: jnp.ndarray,  # (R, S-1) shifted labels
    signs: jnp.ndarray,  # (R, S-1) shifted signs
    sample_ids: jnp.ndarray,  # (R, S-1) shifted 1-based sample ids
    side_mask: jnp.ndarray,  # (R, S-1) bool: tokens of the wanted side
    max_samples: int,
    max_phrases: int = MAX_PHRASES,
) -> jnp.ndarray:
    """(max_samples, max_phrases): [b, k-1] = sum of logps over tokens
    with sample_ids == b+1 and signs == k — the packed equivalent of
    accumulate_phrase_logps where the sample is a (row, segment) pair
    rather than a row."""
    mask = (labels != IGNORE_INDEX) & side_mask
    lp = logps * mask.astype(logps.dtype)
    oh_b = (
        sample_ids[:, :, None]
        == jnp.arange(1, max_samples + 1, dtype=sample_ids.dtype)
    ) & mask[:, :, None]
    oh_k = signs[:, :, None] == jnp.arange(
        1, max_phrases + 1, dtype=signs.dtype
    )
    return jnp.einsum(
        "rs,rsb,rsk->bk",
        lp,
        oh_b.astype(lp.dtype),
        oh_k.astype(lp.dtype),
    )


def packed_alignment_loss(
    logps: jnp.ndarray,  # (R, S-1) shifted
    labels: jnp.ndarray,
    signs: jnp.ndarray,
    sample_ids: jnp.ndarray,
    neg_flags: jnp.ndarray,
    n_samples: jnp.ndarray,  # () int32 — real samples in the batch
    max_samples: int,
    max_phrases: int = MAX_PHRASES,
) -> jnp.ndarray:
    """alignment_loss over packed rows. The present-phrase column set is
    batch-global from the positive documents (reference
    torch.unique(signs), halva_trainer.py:564-567); samples beyond
    n_samples are dead slots and contribute nothing."""
    pos = packed_phrase_logps(
        logps, labels, jnp.maximum(signs, 0), sample_ids,
        neg_flags == 0, max_samples, max_phrases,
    )
    neg = packed_phrase_logps(
        logps, labels, jnp.maximum(signs, 0), sample_ids,
        neg_flags == 1, max_samples, max_phrases,
    )
    ids = jnp.arange(1, max_phrases + 1, dtype=signs.dtype)
    pos_tok = (neg_flags == 0) & (sample_ids > 0)
    present = jnp.any(
        (jnp.maximum(signs, 0)[:, :, None] == ids[None, None, :])
        & pos_tok[:, :, None],
        axis=(0, 1),
    )  # (K,)
    valid = (
        jnp.arange(1, max_samples + 1, dtype=jnp.int32) <= n_samples
    )  # (B,)
    elem = jnp.log1p(jnp.exp(neg - pos))  # (B, K) — log(2) where absent
    num = jnp.sum(
        elem
        * present[None, :].astype(elem.dtype)
        * valid[:, None].astype(elem.dtype)
    )
    denom = n_samples.astype(jnp.float32) * jnp.maximum(
        jnp.sum(present.astype(jnp.float32)), 1.0
    )
    return num / jnp.maximum(denom, 1.0)


def dpa_loss_from_hidden_packed(
    logits_fn,
    pn_hidden: jnp.ndarray,  # (R1, S, D) pos+neg packed rows
    pn_labels: jnp.ndarray,  # (R1, S)
    pn_signs: jnp.ndarray,
    pn_sample_ids: jnp.ndarray,
    pn_neg_flags: jnp.ndarray,
    policy_ref_hidden: jnp.ndarray,  # (R2, S, D)
    frozen_ref_hidden: jnp.ndarray,
    ref_labels: jnp.ndarray,  # (R2, S)
    n_samples: jnp.ndarray,  # () int32
    alpha: float,
    max_samples: int,
    max_phrases: int = MAX_PHRASES,
    chunk: int = 256,
    mesh=None,
) -> DPALossParts:
    """DPA loss over packed rows, logits chunked over the sequence.

    Shift semantics are identical to the row-per-sample path: document
    boundaries are safe because every document starts with a
    label == IGNORE_INDEX token (asserted host-side in train/pack.py),
    so the cross-document position of the shifted gather is masked."""
    lp = per_token_logps_chunked(
        logits_fn, pn_hidden, pn_labels, chunk, mesh
    )
    align = packed_alignment_loss(
        lp,
        pn_labels[:, 1:],
        pn_signs[:, 1:],
        pn_sample_ids[:, 1:],
        pn_neg_flags[:, 1:],
        n_samples,
        max_samples,
        max_phrases,
    )
    div = kl_divergence_chunked(
        logits_fn,
        policy_ref_hidden,
        frozen_ref_hidden,
        ref_labels,
        chunk,
        mesh,
        denom=n_samples.astype(jnp.float32),
    )
    return DPALossParts(align + alpha * div, align, div)


def dpa_loss_from_hidden(
    logits_fn,
    pos_hidden: jnp.ndarray,
    neg_hidden: jnp.ndarray,
    pos_labels: jnp.ndarray,
    neg_labels: jnp.ndarray,
    pos_signs: jnp.ndarray,
    neg_signs: jnp.ndarray,
    policy_ref_hidden: jnp.ndarray,
    frozen_ref_hidden: jnp.ndarray,
    ref_labels: jnp.ndarray,
    alpha: float,
    max_phrases: int = MAX_PHRASES,
    chunk: int = 256,
    mesh=None,
) -> DPALossParts:
    """dpa_loss computed from final hidden states, logits chunked over the
    sequence (see block comment above). Math-parity with dpa_loss is
    asserted by tests/test_dpa_loss.py."""
    pos_lp = per_token_logps_chunked(
        logits_fn, pos_hidden, pos_labels, chunk, mesh
    )
    neg_lp = per_token_logps_chunked(
        logits_fn, neg_hidden, neg_labels, chunk, mesh
    )
    align = alignment_loss(
        pos_lp,
        neg_lp,
        pos_labels[:, 1:],
        neg_labels[:, 1:],
        pos_signs[:, 1:],
        neg_signs[:, 1:],
        max_phrases,
    )
    div = kl_divergence_chunked(
        logits_fn, policy_ref_hidden, frozen_ref_hidden, ref_labels,
        chunk, mesh,
    )
    return DPALossParts(align + alpha * div, align, div)


def dpa_loss(
    pos_logits: jnp.ndarray,  # (B, S, V) policy on positive rows
    neg_logits: jnp.ndarray,  # (B, S, V) policy on negative rows
    pos_labels: jnp.ndarray,  # (B, S) spliced labels
    neg_labels: jnp.ndarray,
    pos_signs: jnp.ndarray,  # (B, S) spliced signs
    neg_signs: jnp.ndarray,
    policy_ref_logits: jnp.ndarray,  # (B, Sr, V) policy on ref batch
    frozen_ref_logits: jnp.ndarray,  # (B, Sr, V) frozen model on ref batch
    ref_labels: jnp.ndarray,  # (B, Sr)
    alpha: float,
    max_phrases: int = MAX_PHRASES,
) -> DPALossParts:
    pos_lp = per_token_logps(pos_logits, pos_labels)
    neg_lp = per_token_logps(neg_logits, neg_labels)
    align = alignment_loss(
        pos_lp,
        neg_lp,
        pos_labels[:, 1:],
        neg_labels[:, 1:],
        pos_signs[:, 1:],
        neg_signs[:, 1:],
        max_phrases,
    )
    div = kl_divergence(policy_ref_logits, frozen_ref_logits, ref_labels)
    return DPALossParts(align + alpha * div, align, div)
