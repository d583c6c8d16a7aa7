"""Attention ops: XLA reference path + dispatch to the Pallas flash kernel.

This replaces the reference's external CUDA flash-attn + Triton kernels
(llava/train/llama_flash_attn_monkey_patch.py, vila/.../flash_attn_triton.py)
with a single attention contract built around *segment ids*:

- causal masking,
- padding (padding tokens carry segment id 0... actually any id; invalid
  query/key pairs are those with differing segment ids),
- sequence packing (multiple documents in one row, different segment ids),

which together cover everything the reference gets from varlen flash-attn
(`seqlens_in_batch` packing in vila/train/transformers_replace).

Segment-id convention: `segment_ids[b, t] == 0` marks padding; tokens attend
only to keys with the *same nonzero* segment id. Single-document rows just
use all-ones.

The XLA path is the numerics oracle (tests) and the CPU fallback; on TPU the
dispatcher uses the Pallas flash kernel (ops/flash_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite big-negative: avoids NaN rows for fully-masked queries


def make_attention_mask(
    q_segment_ids: jnp.ndarray,  # (B, Sq) int32
    kv_segment_ids: jnp.ndarray,  # (B, Skv) int32
    causal: bool = True,
    q_offset: Optional[jnp.ndarray] = None,  # (B,) position of q block start
    sliding_window: Optional[int] = None,  # Mistral-style local window
) -> jnp.ndarray:
    """Boolean (B, 1, Sq, Skv) mask: True = attend.

    `q_offset` supports decode: queries at absolute positions offset+i.
    `sliding_window` keeps only keys within the last W positions.
    """
    same = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]) & (
        q_segment_ids[:, :, None] != 0
    )
    sq = q_segment_ids.shape[1]
    skv = kv_segment_ids.shape[1]
    q_pos = jnp.arange(sq, dtype=jnp.int32)[None, :]
    if q_offset is not None:
        q_pos = q_pos + q_offset[:, None]
    k_pos = jnp.arange(skv, dtype=jnp.int32)[None, :]
    if causal:
        same = same & (q_pos[:, :, None] >= k_pos[:, None, :])
    if sliding_window is not None:
        same = same & (
            q_pos[:, :, None] - k_pos[:, None, :] < sliding_window
        )
    return same[:, None, :, :]


def alibi_bias(
    num_heads: int,
    q_positions: jnp.ndarray,  # (B, Sq)
    k_positions: jnp.ndarray,  # (B, Skv)
) -> jnp.ndarray:
    """(B, H, Sq, Skv) ALiBi additive bias (MPT attention,
    vila/model/language_model/mpt/attention.py:258): slope_h * -(q - k)
    with slopes 2^(-8h/H) over a power-of-two head ladder."""
    import math

    def slopes(n: int):
        def pow2slopes(k):
            start = 2.0 ** (-(2.0 ** -(math.log2(k) - 3)))
            return [start * (start**i) for i in range(k)]

        if math.log2(n).is_integer():
            return pow2slopes(n)
        k = 2 ** math.floor(math.log2(n))
        base = pow2slopes(k)
        extra = pow2slopes(2 * k)[0::2][: n - k]
        return base + extra

    s = jnp.asarray(slopes(num_heads), jnp.float32)  # (H,)
    dist = (
        q_positions[:, :, None] - k_positions[:, None, :]
    ).astype(jnp.float32)  # (B, Sq, Skv), >=0 under causal mask
    return -jnp.abs(dist)[:, None, :, :] * s[None, :, None, None]


def attention_reference(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Skv, KVH, D)
    v: jnp.ndarray,  # (B, Skv, KVH, D)
    mask: Optional[jnp.ndarray] = None,  # (B, 1|H, Sq, Skv) bool
    bias: Optional[jnp.ndarray] = None,  # additive bias, e.g. ALiBi
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Pure-XLA attention. fp32 softmax accumulation, output in q dtype.

    GQA: KVH may divide H; KV heads are broadcast over the query-head groups.
    """
    b, sq, h, d = q.shape
    kvh = k.shape[2]
    if scale is None:
        scale = d**-0.5
    if kvh != h:
        assert h % kvh == 0
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "impl", "alibi", "sliding_window")
)
def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_segment_ids: jnp.ndarray,
    kv_segment_ids: jnp.ndarray,
    causal: bool = True,
    impl: str = "auto",
    alibi: bool = False,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Segment-id attention entry point. Shapes as attention_reference.

    alibi / sliding_window run IN-KERNEL on the flash path (the
    reference's Triton-kernel capability, mpt/flash_attn_triton.py);
    the XLA path materializes the bias/mask instead. ALiBi with a
    non-power-of-two head count always takes the XLA path.
    """
    h = q.shape[2]
    kernel_alibi_ok = not alibi or (h & (h - 1)) == 0
    if impl == "auto":
        impl = (
            "flash"
            if (
                jax.default_backend() == "tpu"
                and q.shape[1] >= 128
                and kernel_alibi_ok
            )
            else "xla"
        )
    if impl == "flash":
        from halva_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, q_segment_ids, kv_segment_ids, causal=causal,
            alibi=alibi, sliding_window=sliding_window,
        )
    mask = make_attention_mask(
        q_segment_ids, kv_segment_ids, causal=causal,
        sliding_window=sliding_window,
    )
    bias = None
    if alibi:
        b, sq = q_segment_ids.shape
        pos = jnp.broadcast_to(jnp.arange(sq, dtype=jnp.int32), (b, sq))
        kpos = jnp.broadcast_to(
            jnp.arange(k.shape[1], dtype=jnp.int32), (b, k.shape[1])
        )
        bias = alibi_bias(h, pos, kpos)
    return attention_reference(q, k, v, mask=mask, bias=bias)
