"""Pallas TPU flash attention with segment ids (causal, padding, packing).

TPU-native replacement for the reference's CUDA flash-attn and Triton
kernels (llava/train/llama_flash_attn_monkey_patch.py:16-93,
vila/model/language_model/mpt/flash_attn_triton.py): one kernel covers
causal masking, right-padding, and packed sequences via segment ids —
the same capability surface as `flash_attn_varlen_func` with
`seqlens_in_batch` (vila/train/transformers_replace/.../modeling_llama.py).

FlashAttention-2 style:
- forward: online softmax over KV blocks; saves per-row logsumexp (LSE).
- backward: recompute probabilities blockwise; dq kernel loops KV blocks,
  dkv kernel loops Q blocks; fp32 accumulation throughout.
- causal block skipping: KV blocks entirely above the diagonal are never
  visited (loop bound depends on the q-block index).

Layout: kernels run on (B, H, S, D) with grid (B, H, blocks); the public
wrapper takes (B, S, H, D) like the rest of the framework. GQA is handled
by broadcasting KV heads through the BlockSpec index maps (no materialized
repeat).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# defaults tuned on v5e (b8 s2048 h32 d128: 128/128 -> 16 TF/s,
# 512/256 -> 31 TF/s, 1024/512 -> 35 TF/s; bigger q blocks amortize
# per-program overhead). Measured dead end: branching the mask away on
# interior uniform blocks (lax.cond) DROPS throughput to ~24 TF/s — the
# in-loop branch defeats Mosaic pipelining; keep the mask unconditional.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30
NUM_LANES = 128
LOG2E = 1.4426950408889634  # softmax runs in exp2 domain (cheaper on VPU)
LN2 = 0.6931471805599453


def _lanes(bk: int) -> int:
    return min(NUM_LANES, bk)


def _btile(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Broadcast an all-lanes-equal (bq, L) stat tensor to (bq, n)."""
    l = x.shape[1]
    if n == l:
        return x
    if n < l:
        return x[:, :n]
    return jnp.tile(x, (1, n // l))


def _block_mask(
    q_seg,  # (bq, 1) int32
    kv_seg,  # (1, bk) int32
    q_start,  # scalar absolute index of q block start
    kv_start,
    bq: int,
    bk: int,
    causal: bool,
):
    mask = (q_seg == kv_seg) & (q_seg != 0)
    if causal:
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = kv_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = mask & (rows >= cols)
    return mask


def _alibi_slope(h_idx, num_heads: int):
    """ALiBi slope for head h: 2^(-8*(h+1)/H) (power-of-two heads; the
    MPT/published formula, reference mpt/attention.py:258)."""
    return jnp.exp2(-8.0 * (h_idx.astype(jnp.float32) + 1.0) / num_heads)


def _fwd_kernel(
    q_ref,  # (1, 1, bq, D)
    k_ref,  # (1, 1, Skv, D)
    v_ref,
    qseg_ref,  # (1, 1, bq)
    kvseg_ref,  # (1, 1, Skv)
    qoff_ref,  # (1, 1) int32 SMEM — global offset of q row 0 (context parallelism)
    o_ref,  # (1, 1, bq, D)
    lse_ref,  # (1, 1, 1, bq)
    *,
    scale: float,
    causal: bool,
    block_k: int,
    kv_len: int,
    alibi_heads: int = 0,  # >0: add ALiBi bias computed from head index
    window: int = 0,  # >0: sliding-window attention width
):
    bq = q_ref.shape[2]
    d = q_ref.shape[3]
    qi = pl.program_id(2)
    q_start = qi * bq + qoff_ref[0, 0]
    nl = _lanes(block_k)

    # matmuls run in the input dtype (bf16 -> MXU native) with fp32
    # accumulation. Softmax stats (m, l) are carried in an
    # all-lanes-equal (bq, nl) fp32 layout: rank-1 (bq,) carries force a
    # (1, bq) lane layout and a relayout every iteration (measured 35
    # TF/s ceiling in round 1; the official TPU kernel uses the same
    # lane-replicated trick).
    q = q_ref[0, 0]
    q_seg = qseg_ref[0, 0][:, None]

    # loop-invariant (bq, bk) row-col difference: per-block causal /
    # window / ALiBi terms reduce to compares against a scalar
    diff = jax.lax.broadcasted_iota(
        jnp.int32, (bq, block_k), 0
    ) - jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)

    num_kv_blocks = pl.cdiv(kv_len, block_k)
    if causal:
        # only blocks whose start is <= q block end
        num_kv_blocks = jnp.minimum(
            num_kv_blocks, (q_start + bq + block_k - 1) // block_k
        )
    kv_block_lo = 0
    if window:
        # skip kv blocks entirely below the window: block ki is fully
        # masked iff its LEAST row-col distance, q_start - (ki*block_k
        # + block_k - 1), is already >= window — on a 32k Mistral-style
        # packed sequence this skips ~85% of the blocks the mask would
        # otherwise zero
        kv_block_lo = jnp.maximum((q_start - window + 1) // block_k, 0)

    if alibi_heads:
        slope = _alibi_slope(pl.program_id(1), alibi_heads) * LOG2E

    total_blocks = kv_len // block_k  # static (kv_len is block-padded)

    # softmax in exp2 domain: exp(x) = exp2(x * log2e); log2e folds into
    # the QK scale (and the ALiBi slope) so the inner loop's
    # transcendentals are raw exp2 — the VPU exponential primitive —
    # instead of exp (= extra multiply per element per block)
    scale2 = scale * LOG2E

    def one_block(ki, carry, check_valid=False):
        o_acc, m, l = carry  # (bq, d) f32, (bq, nl) f32, (bq, nl) f32
        ki_read = jnp.minimum(ki, total_blocks - 1) if check_valid else ki
        kv_start = ki_read * block_k
        k = k_ref[0, 0, pl.ds(kv_start, block_k), :]
        v = v_ref[0, 0, pl.ds(kv_start, block_k), :]
        kv_seg = kvseg_ref[0, 0, pl.ds(kv_start, block_k)][None, :]

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale2
        # absolute row-col distance for this block = diff + (q_start -
        # kv_start); causal is one scalar compare on the precomputed diff
        shift = q_start - kv_start
        mask = (q_seg == kv_seg) & (q_seg != 0)
        if check_valid:
            # odd trailing pair element: clamp the read, zero the block
            mask &= ki < num_kv_blocks
        if causal:
            mask &= diff >= -shift
        if window:
            mask &= diff < (window - shift)
        if alibi_heads:
            # bias = -slope * (row - col); 0 on the diagonal
            s = s - slope * (diff + shift).astype(jnp.float32)
        s = s + jnp.where(mask, 0.0, NEG_INF)

        m_curr = jnp.max(s, axis=1)[:, None]  # (bq, 1)
        m_new = jnp.maximum(m, m_curr)  # (bq, nl)
        alpha = jnp.exp2(m - m_new)
        p = jnp.exp2(s - _btile(m_new, block_k))
        l_new = l * alpha + jnp.sum(p, axis=1)[:, None]
        o_new = o_acc * _btile(alpha, d) + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return o_new, m_new, l_new

    # 2x-unrolled pairs: the second block's QK matmul is independent of
    # the first block's softmax chain, so Mosaic can overlap MXU and VPU
    # across the pair. The second element may fall beyond num_kv_blocks
    # (odd count): its read is clamped in-bounds and its mask zeroed, so
    # it contributes exp(NEG_INF - m) = 0.
    def body(ki2, carry):
        carry = one_block(2 * ki2, carry)
        return one_block(2 * ki2 + 1, carry, check_valid=True)

    o0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, nl), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, nl), jnp.float32)
    # pair-index lower bound: the pair containing kv_block_lo (its first
    # element may sit one block below the window — masked, not skipped)
    o_acc, m, l = jax.lax.fori_loop(
        kv_block_lo // 2, (num_kv_blocks + 1) // 2, body, (o0, m0, l0)
    )

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (o_acc / _btile(l_safe, d)).astype(o_ref.dtype)
    # m is in exp2 domain; emit the natural-log LSE the backward expects
    lse_ref[0, 0, 0] = m[:, 0] * LN2 + jnp.log(l_safe[:, 0])


def _bwd_dq_kernel(
    q_ref,  # (1, 1, bq, D)
    k_ref,  # (1, 1, Skv, D)
    v_ref,
    qseg_ref,
    kvseg_ref,
    qoff_ref,  # (1, 1) int32 SMEM
    do_ref,  # (1, 1, bq, D)
    lse_ref,  # (1, 1, 1, bq)
    delta_ref,  # (1, 1, 1, bq)
    dq_ref,  # (1, 1, bq, D)
    *,
    scale: float,
    causal: bool,
    block_k: int,
    kv_len: int,
    alibi_heads: int = 0,
    window: int = 0,
):
    bq = q_ref.shape[2]
    d = q_ref.shape[3]
    qi = pl.program_id(2)
    q_start = qi * bq + qoff_ref[0, 0]

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0, 0][:, None]
    delta = delta_ref[0, 0, 0][:, None]
    q_seg = qseg_ref[0, 0][:, None]
    diff = jax.lax.broadcasted_iota(
        jnp.int32, (bq, block_k), 0
    ) - jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)

    num_kv_blocks = pl.cdiv(kv_len, block_k)
    if causal:
        num_kv_blocks = jnp.minimum(
            num_kv_blocks, (q_start + bq + block_k - 1) // block_k
        )
    kv_block_lo = 0
    if window:
        # skip kv blocks entirely below the window (see _fwd_kernel)
        kv_block_lo = jnp.maximum((q_start - window + 1) // block_k, 0)
    if alibi_heads:
        slope = _alibi_slope(pl.program_id(1), alibi_heads) * LOG2E

    scale2 = scale * LOG2E  # exp2-domain probabilities (see _fwd_kernel)
    lse2 = lse * LOG2E

    def body(ki, dq):
        kv_start = ki * block_k
        k = k_ref[0, 0, pl.ds(kv_start, block_k), :]
        v = v_ref[0, 0, pl.ds(kv_start, block_k), :]
        kv_seg = kvseg_ref[0, 0, pl.ds(kv_start, block_k)][None, :]

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale2
        shift = q_start - kv_start
        mask = (q_seg == kv_seg) & (q_seg != 0)
        if causal:
            mask &= diff >= -shift
        if window:
            mask &= diff < (window - shift)
        if alibi_heads:
            s = s - slope * (diff + shift).astype(jnp.float32)
        p = jnp.where(mask, jnp.exp2(s - lse2), 0.0)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(k.dtype)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq0 = jnp.zeros((bq, d), jnp.float32)
    dq = jax.lax.fori_loop(kv_block_lo, num_kv_blocks, body, dq0)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref,  # (1, 1, Sq, D)
    k_ref,  # (1, 1, bk, D)
    v_ref,  # (1, 1, bk, D)
    qseg_ref,  # (1, 1, Sq)
    kvseg_ref,  # (1, 1, bk)
    qoff_ref,  # (1, 1) int32 SMEM
    do_ref,  # (1, 1, Sq, D)
    lse_ref,  # (1, 1, 1, Sq)
    delta_ref,  # (1, 1, 1, Sq)
    dk_ref,  # (1, 1, bk, D)
    dv_ref,
    *,
    scale: float,
    causal: bool,
    block_q: int,
    q_len: int,
    alibi_heads: int = 0,
    window: int = 0,
):
    bk = k_ref.shape[2]
    d = k_ref.shape[3]
    ki = pl.program_id(2)
    kv_start = ki * bk
    q_off = qoff_ref[0, 0]

    k = k_ref[0, 0]
    v = v_ref[0, 0]
    kv_seg = kvseg_ref[0, 0][None, :]
    diff = jax.lax.broadcasted_iota(
        jnp.int32, (block_q, bk), 0
    ) - jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1)

    num_q_blocks = pl.cdiv(q_len, block_q)
    q_block_lo = 0
    if causal:
        # first (local) q block that can see this kv block; with a
        # context-parallel q offset the kv column is at global kv_start
        # while local q row i sits at global q_off + i
        q_block_lo = jnp.maximum(kv_start - q_off, 0) // block_q
    if window:
        # skip q blocks entirely ABOVE the window of this kv block:
        # local q block qi is fully masked iff its least row-col
        # distance, (qi*block_q + q_off) - (kv_start + bk - 1), is
        # already >= window (mirror of _fwd_kernel's kv_block_lo)
        num_q_blocks = jnp.minimum(
            num_q_blocks,
            jnp.maximum(
                -(-(kv_start + bk - 1 + window - q_off) // block_q), 0
            ),
        )
    if alibi_heads:
        slope = _alibi_slope(pl.program_id(1), alibi_heads) * LOG2E

    scale2 = scale * LOG2E  # exp2-domain probabilities (see _fwd_kernel)

    def body(qi, carry):
        dk, dv = carry
        q_start = qi * block_q  # local (slicing) index
        q = q_ref[0, 0, pl.ds(q_start, block_q), :]
        do = do_ref[0, 0, pl.ds(q_start, block_q), :]
        lse = lse_ref[0, 0, 0, pl.ds(q_start, block_q)][:, None]
        delta = delta_ref[0, 0, 0, pl.ds(q_start, block_q)][:, None]
        q_seg = qseg_ref[0, 0, pl.ds(q_start, block_q)][:, None]

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale2
        shift = q_start + q_off - kv_start  # global row-col shift
        mask = (q_seg == kv_seg) & (q_seg != 0)
        if causal:
            mask &= diff >= -shift
        if window:
            mask &= diff < (window - shift)
        if alibi_heads:
            s = s - slope * (diff + shift).astype(jnp.float32)
        p = jnp.where(mask, jnp.exp2(s - lse * LOG2E), 0.0)
        dv_new = dv + jnp.dot(
            p.astype(do.dtype).T, do, preferred_element_type=jnp.float32
        )
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dk_new = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(q_block_lo, num_q_blocks, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11)
)
def _flash(
    q,  # (B, H, Sq, D)
    k,  # (B, KVH, Skv, D)
    v,
    q_seg,  # (B, Sq)
    kv_seg,  # (B, Skv)
    q_off,  # (1, 1) int32 — global position of q row 0 (context parallelism)
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    alibi_heads: int,
    window: int,
):
    o, _ = _flash_fwd_impl(
        q, k, v, q_seg, kv_seg, q_off, causal, scale, block_q, block_k,
        alibi_heads, window,
    )
    return o


def _specs_fwd(b, h, kvh, sq, skv, d, bq, interp):
    group = h // kvh
    return dict(
        grid=(b, h, sq // bq),
        # every (batch, head, q-block) output tile is independent (the
        # kv reduction is an in-kernel fori_loop): mark all grid dims
        # parallel so Mosaic splits them across the chip's 2 megacores
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, skv, d),
                lambda bi, hi, qi: (bi, hi // group, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, skv, d),
                lambda bi, hi, qi: (bi, hi // group, 0, 0),
            ),
            pl.BlockSpec((1, 1, bq), lambda bi, hi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, skv), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        interpret=interp,
    )


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _flash_fwd_impl(
    q, k, v, q_seg, kv_seg, q_off, causal, scale, bq, bk,
    alibi_heads=0, window=0,
):
    b, h, sq, d = q.shape
    kvh, skv = k.shape[1], k.shape[2]
    sq_p = sq + (-sq) % bq
    skv_p = skv + (-skv) % bk
    qp = _pad_to(q, 2, bq)
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    qsp = _pad_to(q_seg.astype(jnp.int32), 1, bq)[:, None, :]
    kvsp = _pad_to(kv_seg.astype(jnp.int32), 1, bk)[:, None, :]

    specs = _specs_fwd(b, h, kvh, sq_p, skv_p, d, bq, _interp())
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, block_k=bk, kv_len=skv_p,
        alibi_heads=alibi_heads, window=window,
    )
    o, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, sq_p), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi: (bi, hi, 0, qi)),
        ),
        **specs,
    )(qp, kp, vp, qsp, kvsp, q_off)
    lse = lse[:, :, 0, :sq]
    return o[:, :, :sq], (q, k, v, q_seg, kv_seg, q_off, o[:, :, :sq], lse)


def _flash_fwd(
    q, k, v, q_seg, kv_seg, q_off, causal, scale, bq, bk, alibi_heads,
    window,
):
    o, res = _flash_fwd_impl(
        q, k, v, q_seg, kv_seg, q_off, causal, scale, bq, bk, alibi_heads,
        window,
    )
    return o, res


def _flash_bwd(causal, scale, bq, bk, alibi_heads, window, res, do):
    q, k, v, q_seg, kv_seg, q_off, o, lse = res
    b, h, sq, d = q.shape
    kvh, skv = k.shape[1], k.shape[2]
    group = h // kvh

    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # (B, H, Sq)

    sq_p = sq + (-sq) % bq
    skv_p = skv + (-skv) % bk
    qp = _pad_to(q, 2, bq)
    kp = _pad_to(k, 2, bk)
    vp = _pad_to(v, 2, bk)
    dop = _pad_to(do, 2, bq)
    lsep = _pad_to(lse, 2, bq)[:, :, None, :]
    deltap = _pad_to(delta, 2, bq)[:, :, None, :]
    qsp = _pad_to(q_seg.astype(jnp.int32), 1, bq)[:, None, :]
    kvsp = _pad_to(kv_seg.astype(jnp.int32), 1, bk)[:, None, :]
    interp = _interp()

    # ---- dq ----
    dq_kernel = functools.partial(
        _bwd_dq_kernel, scale=scale, causal=causal, block_k=bk,
        kv_len=skv_p, alibi_heads=alibi_heads, window=window,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, sq_p // bq),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec(
                (1, 1, skv_p, d), lambda bi, hi, qi: (bi, hi // group, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, skv_p, d), lambda bi, hi, qi: (bi, hi // group, 0, 0)
            ),
            pl.BlockSpec((1, 1, bq), lambda bi, hi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, 1, skv_p), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi: (bi, hi, 0, qi)),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi: (bi, hi, 0, qi)),
        ],
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        out_specs=pl.BlockSpec(
            (1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        interpret=interp,
    )(qp, kp, vp, qsp, kvsp, q_off, dop, lsep, deltap)[:, :, :sq]

    # ---- dk, dv ---- (accumulated per query-head, summed over groups after)
    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, scale=scale, causal=causal, block_q=bq,
        q_len=sq_p, alibi_heads=alibi_heads, window=window,
    )
    dk_h, dv_h = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, skv_p // bk),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        in_specs=[
            pl.BlockSpec((1, 1, sq_p, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec(
                (1, 1, bk, d), lambda bi, hi, ki: (bi, hi // group, ki, 0)
            ),
            pl.BlockSpec(
                (1, 1, bk, d), lambda bi, hi, ki: (bi, hi // group, ki, 0)
            ),
            pl.BlockSpec((1, 1, sq_p), lambda bi, hi, ki: (bi, 0, 0)),
            pl.BlockSpec((1, 1, bk), lambda bi, hi, ki: (bi, 0, ki)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, sq_p, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, sq_p), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, sq_p), lambda bi, hi, ki: (bi, hi, 0, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((b, h, skv_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, skv_p, d), jnp.float32),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
        ),
        interpret=interp,
    )(qp, kp, vp, qsp, kvsp, q_off, dop, lsep, deltap)

    dk_h = dk_h[:, :, :skv]
    dv_h = dv_h[:, :, :skv]
    if group > 1:
        dk = dk_h.reshape(b, kvh, group, skv, d).sum(axis=2)
        dv = dv_h.reshape(b, kvh, group, skv, d).sum(axis=2)
    else:
        dk, dv = dk_h, dv_h

    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        None,
        None,
        None,
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Skv, KVH, D)
    v: jnp.ndarray,
    q_segment_ids: jnp.ndarray,  # (B, Sq)
    kv_segment_ids: jnp.ndarray,  # (B, Skv)
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    alibi: bool = False,
    sliding_window: Optional[int] = None,
    q_offset=None,  # traced scalar int32, or None
) -> jnp.ndarray:
    """Public entry; layout matches halva_tpu.ops.attention.

    alibi: add the MPT ALiBi bias in-kernel (capability of the
    reference's Triton kernel, mpt/flash_attn_triton.py; slopes use the
    power-of-two-heads formula — callers with non-pow2 heads should use
    the XLA reference path). sliding_window: Mistral-style local
    attention width, masked in-kernel.

    q_offset: global position of q row 0 (context parallelism: each
    device holds an Sq-shard of queries against the full gathered KV;
    causal / window / ALiBi terms use global row indices). May be a
    traced scalar (e.g. lax.axis_index * shard_len inside shard_map).
    """
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    sq = q.shape[1]
    # shrink the q block for short sequences, but keep it a 128-multiple:
    # the bwd kernels slice LSE/delta rows at block_q strides along the
    # LANE dimension, and Mosaic requires lane indices provably 128-
    # aligned (measured on-chip: sq=136 -> block_q=136 fails to compile
    # with "index in dimension 3 is a multiple of 128"; padded rows are
    # dead via zero segment ids, so rounding up is mask-safe)
    block_q = min(block_q, max(-(-sq // 128) * 128, 128))
    # caller-supplied sizes must be 128-multiples too (cp_flash_attention
    # passes min(block_q, sq_local)): round UP — padded rows/cols are
    # dead via zero segment ids, while an unaligned size is a REAL-TPU
    # Mosaic compile failure the CPU interpret tests cannot catch
    block_q = -(-block_q // 128) * 128
    block_k = -(-block_k // 128) * 128
    h = q.shape[2]
    if alibi and (h & (h - 1)):
        raise ValueError(
            "in-kernel ALiBi needs power-of-two head counts; use the XLA "
            "reference attention otherwise"
        )
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    q_off = jnp.reshape(
        jnp.asarray(0 if q_offset is None else q_offset, jnp.int32), (1, 1)
    )
    o = _flash(
        qt,
        kt,
        vt,
        q_segment_ids,
        kv_segment_ids,
        q_off,
        causal,
        float(scale),
        block_q,
        block_k,
        h if alibi else 0,
        int(sliding_window or 0),
    )
    return o.transpose(0, 2, 1, 3)
