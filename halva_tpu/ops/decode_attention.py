"""Pallas decode attention over the full stacked (L-layer) KV caches.

Why a kernel: measured on v5e (scripts/profile_decode.py, llava-7b b24
Sp=623 int8 KV), the XLA decode step spent ~17.7 ms/step in attention
against a ~4 ms HBM floor — XLA materializes bf16 dequant copies of the
int8 prompt cache every step. A first kernel over per-layer cache
slices still paid ~16 ms/step in XLA `dynamic-slice` copies: a Pallas
custom call cannot fuse with the slice that feeds it, so every layer's
(B,H,Sp,D) slice materialized. This version eliminates the slices too:
the kernel takes the WHOLE stacked (L,B,H,Sp,D) caches and indexes the
layer dimension inside the BlockSpec index maps via a scalar-prefetch
layer index — blocks DMA straight from the big HBM arrays.

Cache layouts are HEAD-MAJOR ((L,B,H,S,D), produced by
models/llama.py:prefill / init_gen_cache): per-head sequence blocks are
DMA-contiguous and Mosaic's batched dots need batch dims at position 0
(an in-kernel transpose of seq-major blocks measured 3.2 ms/layer).
The (tiny) generated cache is attended in the same kernel on the last
grid step, and the merged, normalized output is written directly.

int8 dequant happens in-register on the VMEM-resident block; the
per-(head, token) scales multiply the logits/probabilities exactly like
the XLA oracle (models/llama.py:_decode_attend), so numerics match.

GQA runs grouped: q (B, 1, H, Dh) folds to (KVH, G, Dh) per batch row
and every batched dot carries G query rows per kv head — the caches
stay at their true KVH size (no jnp.repeat materialization), so decode
KV traffic for Mistral/Gemma-class checkpoints is the real KVH-sized
cache. MHA is the G == 1 case of the same code path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# shared with the flash kernel — one backend-detection rule (the axon
# relay reports "tpu"; a drifted copy would silently flip one kernel to
# interpret mode) and one softmax-domain constant set
from halva_tpu.ops.flash_attention import LOG2E, NEG_INF, _interp

# sentinel: "auto" — decode_attend_layer sizes blocks from the scoped-
# VMEM budget and the true prompt length (minimal padding). Passing any
# other value pins the block row count (rounded to the mode's granule).
DEFAULT_BLOCK_K = 512


def fused_budget_ok(
    hk: int, sg: int, d: int, gen_itemsize: int,
    kp_itemsize: int, quantized4: bool,
) -> bool:
    """Whether the fused kernel's resident blocks fit the scoped-VMEM
    compile budget at the MINIMUM block size: the (whole-Sg) gen-cache
    k+v blocks plus one granule of double-buffered prompt k+v. False
    means a pallas compile would die with "exceeded scoped vmem limit"
    on real TPU (e.g. the eval CLI's --max-new-tokens 1024 default at
    7B: 16MB of gen blocks alone) — callers must take the XLA oracle or
    raise HALVA_SCOPED_VMEM_MB (entry points translate it into
    --xla_tpu_scoped_vmem_limit_kib, halva_tpu/envflags.py)."""
    vmem_mb = int(os.environ.get("HALVA_SCOPED_VMEM_MB", "16"))
    gran = 256 if quantized4 else 128
    kv_row_bytes = hk * d * (1 if quantized4 else 2 * kp_itemsize)
    gen_blk = 2 * 2 * hk * sg * d * gen_itemsize
    return (vmem_mb - 3) * 2**20 - gen_blk >= 2 * gran * kv_row_bytes


def seg_even_odd(seg: jnp.ndarray) -> jnp.ndarray:
    """(B, S) segment ids -> (B, 2, ceil(S/2)) de-interleaved even/odd
    planes (odd tail padded with 0 = invalid), matching the int4 packed
    cache row order (llama._quantize_kv4)."""
    if seg.shape[1] % 2:
        seg = jnp.pad(seg, ((0, 0), (0, 1)))
    return jnp.stack([seg[:, 0::2], seg[:, 1::2]], axis=1)


def _decode_kernel(
    li_ref,  # (1,) int32 scalar prefetch — layer index
    q_ref,  # (R, H, D) bf16
    kp_ref,  # (1, R, H, bk, D) int8|bf16 block of (L, B, H, Sp, D);
    #          int4 mode: (1, R, H, bk/2, D) int8 nibble-packed block
    #          of (L, B, H, Sp/2, D)
    vp_ref,
    seg_ref,  # (R, 1, bk) int32 block of (B, 1, Sp);
    #           int4 mode: (R, 2, bk/2) block of (B, 2, Sp/2) even/odd
    ks_ref,  # (1, R, H, bk) bf16 block of (L, B, H, Sp); dummy if !quant
    #          int4 mode: (1, R, 2, H, bk/2) block of (L, B, 2, H, Sp/2)
    vs_ref,
    kg_ref,  # (1, R, H, Sg, D) bf16|int8 block of (L, B, H, Sg, D)
    vg_ref,
    gks_ref,  # (1, R, H, Sg) bf16 gen scales; dummy if !quantized_gen
    gvs_ref,
    gv_ref,  # (R, 1, Sg) int32 block of (B, 1, Sg)
    o_ref,  # (R, H, D)
    acc_s,  # (beams*rows, H, D) f32 scratch
    m_s,  # (beams*rows, H, L) f32 scratch (lane-replicated)
    l_s,  # (beams*rows, H, L) f32 scratch
    *,
    scale: float,
    quantized: bool,
    quantized4: bool,
    quantized_gen: bool,
    nblocks: int,
    sp: int,
    block_k: int,
    lanes: int,
    groups: int = 1,
    beams: int = 1,
    rows: int = 1,
):
    del li_ref  # consumed by the index maps
    ki = pl.program_id(1)
    # beams > 1: the grid is (items, kv-blocks, beams) with the BEAM
    # index innermost, so the K consecutive grid steps of one (item,
    # block) pair map to the SAME prompt block — Pallas's pipeline
    # elides re-fetching operand blocks whose index map output did not
    # change, so the prompt cache streams from HBM ONCE per item
    # instead of once per beam (the measured ~25% K-fold re-streaming
    # share of the round-3 beam step, BEAM_ONCHIP.json). Each beam
    # accumulates softmax state in its own slab of the scratch
    # (leading-dim indexing — always layout-legal).
    bj = pl.program_id(2) if beams > 1 else 0
    h, d = q_ref.shape[1], q_ref.shape[2]  # h = QUERY heads
    hk = h // groups  # kv heads (cache-side block dim)
    sg = kg_ref.shape[3]

    # rows > 1: each grid step carries `rows` batch rows of the SAME
    # kv-block index (blocks gain a leading rows dim; the python loop
    # below unrolls). Fewer, fatter grid steps amortize the per-step
    # pipeline overhead that dominates once blocks are padding-free
    # (measured ~4us/step against a ~6.4us 5.2MB DMA at 7B b24) — at
    # the cost of rows x the VMEM footprint, so the caller gates it on
    # a raised --xla_tpu_scoped_vmem_limit_kib budget. Each (beam, row)
    # accumulates in its own leading-dim scratch slab.
    for r in range(rows):
        si = bj * rows + r if beams > 1 else r

        @pl.when(ki == 0)
        def _init(si=si):
            acc_s[si] = jnp.zeros((h, d), jnp.float32)
            # finite init below any real logit: a fully-masked block
            # then yields p = exp2(NEG_INF - (-1e29)) = 0, not 1
            m_s[si] = jnp.full((h, lanes), -1e29, jnp.float32)
            l_s[si] = jnp.zeros((h, lanes), jnp.float32)

        q = q_ref[r]  # (H, D)
        # GQA runs grouped: (H, D) -> (KVH, G, D) splits the MAJOR dim
        # only (lane dim D untouched — layout-legal), and the batched
        # dots carry G query rows per kv head instead of 1. MHA is the
        # G == 1 case of the same code.
        q3 = q.reshape(hk, groups, d)

        def _merge_prompt_block(kt, vt, lp_scale_row, pv_scale_row,
                                mask, q=q, q3=q3, si=si):
            """One softmax-merge of `cols` prompt kv rows into the
            running (m, l, acc) scratch slab. kt/vt (KVH, cols, D);
            *_scale_row (KVH, cols) f32 or None; mask (1, cols)."""
            cols = kt.shape[1]
            lp3 = jax.lax.dot_general(
                q3,  # (KVH, G, D) — Mosaic batched form
                kt,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (KVH, G, cols)
            if lp_scale_row is not None:
                lp3 = lp3 * lp_scale_row[:, None, :]
            lp = lp3.reshape(h, cols)  # major-dim merge
            lp = lp * (scale * LOG2E)  # softmax runs in exp2 domain
            lp = jnp.where(mask, lp, NEG_INF)
            m_prev = m_s[si]
            l_prev = l_s[si]
            m_cur = jnp.max(lp, axis=1, keepdims=True)  # (H, 1)
            m_new = jnp.maximum(m_prev, m_cur)  # (H, L)
            alpha = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(lp - jnp.broadcast_to(m_new[:, :1], (h, cols)))
            if pv_scale_row is not None:
                # v scales may be garbage past Sp; p is 0 there,
                # 0*NaN=NaN
                pv3 = jnp.where(
                    mask[None],
                    p.reshape(hk, groups, cols)
                    * pv_scale_row[:, None, :],
                    0.0,
                )
            else:
                pv3 = p.reshape(hk, groups, cols)
            l_s[si] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_s[si] = m_new
            step_acc = jax.lax.dot_general(
                pv3.astype(q.dtype),  # (KVH, G, cols)
                vt,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(h, d)
            acc_s[si] = acc_s[si] * jnp.broadcast_to(
                alpha[:, :1], (h, d)
            ) + step_acc

        if quantized4:
            # nibble-packed token pairs: process the bk-token block as
            # TWO aligned sub-blocks of bk/2 columns (even, odd).
            # Unpack with int32 shifts (Mosaic rejects int8 shifts).
            bk2 = kp_ref.shape[3]
            kx = kp_ref[0, r].astype(jnp.int32)  # (H, bk2, D)
            vx = vp_ref[0, r].astype(jnp.int32)
            k_sub = ((kx << 28) >> 28, kx >> 4)  # even, odd nibbles
            v_sub = ((vx << 28) >> 28, vx >> 4)
            seg_eo = seg_ref[r]  # (2, bk2) int32
            for sub in (0, 1):
                col_ok = (
                    2 * jax.lax.broadcasted_iota(jnp.int32, (1, bk2), 1)
                    + sub + ki * block_k
                    < sp
                )
                mask = col_ok & (seg_eo[sub].reshape(1, bk2) != 0)
                # even/odd scale planes live on a LEADING block dim
                # ((1, R, 2, H, bk2)) — leading-dim selection is always
                # layout-legal, unlike lane/sublane slicing
                _merge_prompt_block(
                    k_sub[sub].astype(q.dtype),
                    v_sub[sub].astype(q.dtype),
                    ks_ref[0, r, sub].astype(jnp.float32),
                    vs_ref[0, r, sub].astype(jnp.float32),
                    mask,
                )
        else:
            bk = kp_ref.shape[3]
            kt = kp_ref[0, r].astype(q.dtype)  # (H, bk, D), in-register
            vt = vp_ref[0, r].astype(q.dtype)
            # the last block may read past Sp (Sp need not divide
            # block_k): mask by absolute column AND segment id; select
            # (not add) so inf/NaN garbage in the out-of-bounds tail
            # cannot leak through
            col_ok = (
                jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
                + ki * block_k
                < sp
            )
            mask = col_ok & (seg_ref[r] != 0)  # (1, bk)
            if not quantized:
                # zero garbage V rows past Sp. The (bk, 1) mask must be
                # built WITHOUT reshaping a 1-bit vector: Mosaic rejects
                # minor-dim insertion on i1 ("only supported for 32-bit
                # types") — iota directly in target shape + reshape the
                # i32 segment block
                col_ok_t = (
                    jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
                    + ki * block_k
                    < sp
                )
                seg_t = seg_ref[r].reshape(bk, 1)  # i32 reshape: legal
                mask_t = col_ok_t & (seg_t != 0)  # (bk, 1)
                vt = jnp.where(mask_t, vt, jnp.zeros_like(vt))
            _merge_prompt_block(
                kt,
                vt,
                ks_ref[0, r].astype(jnp.float32) if quantized else None,
                vs_ref[0, r].astype(jnp.float32) if quantized else None,
                mask,
            )

        @pl.when(ki == nblocks - 1)
        def _gen_and_finalize(q=q, q3=q3, si=si, r=r):
            kgt = kg_ref[0, r].astype(q.dtype)  # (KVH, Sg, D)
            vgt = vg_ref[0, r].astype(q.dtype)
            lg3 = jax.lax.dot_general(
                q3,
                kgt,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (KVH, G, Sg)
            if quantized_gen:
                lg3 = lg3 * gks_ref[0, r].astype(jnp.float32)[:, None, :]
            lg = lg3.reshape(h, sg)
            lg = lg * (scale * LOG2E)
            lg = jnp.where(gv_ref[r] != 0, lg, NEG_INF)
            m_prev2 = m_s[si]
            l_prev2 = l_s[si]
            m_cur2 = jnp.max(lg, axis=1, keepdims=True)
            m_fin = jnp.maximum(m_prev2, m_cur2)
            alpha2 = jnp.exp2(m_prev2 - m_fin)
            pg = jnp.exp2(lg - jnp.broadcast_to(m_fin[:, :1], (h, sg)))
            l_fin = l_prev2 * alpha2 + jnp.sum(pg, axis=1, keepdims=True)
            pg3 = pg.reshape(hk, groups, sg)
            if quantized_gen:
                pg3 = pg3 * gvs_ref[0, r].astype(jnp.float32)[:, None, :]
            acc_fin = acc_s[si] * jnp.broadcast_to(
                alpha2[:, :1], (h, d)
            ) + jax.lax.dot_general(
                pg3.astype(q.dtype),
                vgt,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(h, d)
            l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
            o_ref[r] = (
                acc_fin / jnp.broadcast_to(l_safe[:, :1], (h, d))
            ).astype(o_ref.dtype)


def _fold_kernel(
    li_ref,  # (1,) int32 scalar prefetch — layer index
    q_ref,  # (1, KVH, K*G, D) bf16 — folded queries, row = sub*G + g
    kp_ref,  # (1, 1, KVH, bk, D) prompt block (int4: (1, 1, KVH, bk/2, D))
    vp_ref,
    seg_ref,  # (1, 1, bk) int32 (int4: (1, 2, bk/2) even/odd planes)
    ks_ref,  # (1, 1, KVH, bk) scales (int4: (1, 1, 2, KVH, bk/2)); dummy
    vs_ref,
    kg_ref,  # (1, GB, KVH, Sg, D) gen blocks — GB = K (per-beam caches)
    #          or 1 (shared_gen: speculative verify)
    vg_ref,
    gks_ref,  # (1, GB, KVH, Sg) gen scales; dummy if !quantized_gen
    gvs_ref,
    gv_ref,  # (GB, 1, Sg) int32 validity
    kc_ref,  # (1, KVH, NCP, D) fresh candidate keys, lane-padded; dummy
    vc_ref,
    o_ref,  # (K, H, D)
    acc_s,  # (KVH*K*G, D) f32 scratch
    m_s,  # (KVH*K*G, L) f32 scratch (lane-replicated)
    l_s,  # (KVH*K*G, L) f32 scratch
    *,
    scale: float,
    quantized: bool,
    quantized4: bool,
    quantized_gen: bool,
    nblocks: int,
    sp: int,
    block_k: int,
    lanes: int,
    groups: int,
    fold_k: int,
    shared_gen: bool,
    n_cand: int,
):
    """Beams/candidates FOLDED into the batched dot's row dimension.

    The round-4 beam kernel put the beam index on an (innermost) grid
    dimension: prompt blocks were elided across consecutive beam steps,
    but every dot still carried only G query rows per kv head — at MHA
    (G == 1) Mosaic pads a 1-row dot to a full 8-sublane MXU pass, so K
    beams paid K MXU passes for work one pass can do. Here ALL fold_k
    query rows of an item ride ONE dot: lhs (KVH, K*G, D), so K <= 8
    beams cost the same MXU time as one, and the grid loses the beam
    dimension entirely (K x fewer grid steps).

    Two gen-stage modes:
    - per-beam (shared_gen=False, beam search): gen blocks carry the K
      beams' caches; each beam's block merges under a row mask that
      NEG_INF-masks the other beams' query rows (a fully-masked merge
      is an exact no-op: alpha=1, p=0).
    - shared (shared_gen=True, speculative verify): ONE gen cache per
      item, one merge, per-item validity. The K fresh candidate KVs
      arrive via kc/vc (never from the cache — rejected drafts need no
      rollback, models/llama.py:_verify_attend) and merge under the
      intra-candidate causal mask row_sub >= col (query i attends
      candidates j <= i)."""
    del li_ref  # consumed by the index maps
    ki = pl.program_id(1)
    hk = q_ref.shape[1]
    kgd = q_ref.shape[2]  # fold_k * groups
    d = q_ref.shape[3]
    h = hk * groups
    hkr = hk * kgd  # total scratch rows
    sg = kg_ref.shape[3]

    @pl.when(ki == 0)
    def _init():
        acc_s[...] = jnp.zeros((hkr, d), jnp.float32)
        m_s[...] = jnp.full((hkr, lanes), -1e29, jnp.float32)
        l_s[...] = jnp.zeros((hkr, lanes), jnp.float32)

    q3 = q_ref[0]  # (KVH, K*G, D)

    def _merge(kt, vt, k_scale_row, v_scale_row, mask3):
        """Softmax-merge `cols` kv rows into the running scratch.
        kt/vt (KVH, cols, D); scales (KVH, cols) f32 or None; mask3
        broadcastable to (KVH, K*G, cols). Same exp2-domain math as
        _decode_kernel's merge, with K*G query rows per kv head."""
        cols = kt.shape[1]
        lp3 = jax.lax.dot_general(
            q3, kt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (KVH, K*G, cols)
        if k_scale_row is not None:
            lp3 = lp3 * k_scale_row[:, None, :]
        lp3 = lp3 * (scale * LOG2E)
        lp3 = jnp.where(mask3, lp3, NEG_INF)
        lp = lp3.reshape(hkr, cols)
        m_prev = m_s[...]
        l_prev = l_s[...]
        m_cur = jnp.max(lp, axis=1, keepdims=True)  # (hkr, 1)
        m_new = jnp.maximum(m_prev, m_cur)  # (hkr, L)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(lp - jnp.broadcast_to(m_new[:, :1], (hkr, cols)))
        p3 = p.reshape(hk, kgd, cols)
        if v_scale_row is not None:
            # v scales may be garbage at masked slots; p is 0 there,
            # 0*NaN=NaN — select through the same mask
            pv3 = jnp.where(mask3, p3 * v_scale_row[:, None, :], 0.0)
        else:
            pv3 = p3
        l_s[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_s[...] = m_new
        step_acc = jax.lax.dot_general(
            pv3.astype(q3.dtype), vt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(hkr, d)
        acc_s[...] = acc_s[...] * jnp.broadcast_to(
            alpha[:, :1], (hkr, d)
        ) + step_acc

    # ---- prompt blocks (identical masking rules to _decode_kernel)
    if quantized4:
        bk2 = kp_ref.shape[3]
        kx = kp_ref[0, 0].astype(jnp.int32)  # (KVH, bk2, D)
        vx = vp_ref[0, 0].astype(jnp.int32)
        k_sub = ((kx << 28) >> 28, kx >> 4)  # even, odd nibbles
        v_sub = ((vx << 28) >> 28, vx >> 4)
        seg_eo = seg_ref[0]  # (2, bk2)
        for sub in (0, 1):
            col_ok = (
                2 * jax.lax.broadcasted_iota(jnp.int32, (1, bk2), 1)
                + sub + ki * block_k
                < sp
            )
            mask = col_ok & (seg_eo[sub].reshape(1, bk2) != 0)
            _merge(
                k_sub[sub].astype(q3.dtype),
                v_sub[sub].astype(q3.dtype),
                ks_ref[0, 0, sub].astype(jnp.float32),
                vs_ref[0, 0, sub].astype(jnp.float32),
                mask[None],
            )
    else:
        bk = kp_ref.shape[3]
        kt = kp_ref[0, 0].astype(q3.dtype)
        vt = vp_ref[0, 0].astype(q3.dtype)
        col_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
            + ki * block_k
            < sp
        )
        mask = col_ok & (seg_ref[0, 0].reshape(1, bk) != 0)
        if not quantized:
            col_ok_t = (
                jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
                + ki * block_k
                < sp
            )
            seg_t = seg_ref[0, 0].reshape(bk, 1)
            mask_t = col_ok_t & (seg_t != 0)
            vt = jnp.where(mask_t, vt, jnp.zeros_like(vt))
        _merge(
            kt,
            vt,
            ks_ref[0, 0].astype(jnp.float32) if quantized else None,
            vs_ref[0, 0].astype(jnp.float32) if quantized else None,
            mask[None],
        )

    @pl.when(ki == nblocks - 1)
    def _gen_cand_finalize():
        if shared_gen:
            mask3 = (gv_ref[0] != 0)[None]  # (1, 1, Sg)
            _merge(
                kg_ref[0, 0].astype(q3.dtype),
                vg_ref[0, 0].astype(q3.dtype),
                gks_ref[0, 0].astype(jnp.float32)
                if quantized_gen else None,
                gvs_ref[0, 0].astype(jnp.float32)
                if quantized_gen else None,
                mask3,
            )
        else:
            row_sub = (
                jax.lax.broadcasted_iota(jnp.int32, (kgd, 1), 0) // groups
            )
            for sub in range(fold_k):
                mask2 = (row_sub == sub) & (gv_ref[sub] != 0)  # (KG, Sg)
                _merge(
                    kg_ref[0, sub].astype(q3.dtype),
                    vg_ref[0, sub].astype(q3.dtype),
                    gks_ref[0, sub].astype(jnp.float32)
                    if quantized_gen else None,
                    gvs_ref[0, sub].astype(jnp.float32)
                    if quantized_gen else None,
                    mask2[None],
                )
        if n_cand:
            kct = kc_ref[0].astype(q3.dtype)  # (KVH, NCP, D)
            vct = vc_ref[0].astype(q3.dtype)
            ncp = kct.shape[1]
            row_q = (
                jax.lax.broadcasted_iota(jnp.int32, (kgd, ncp), 0)
                // groups
            )
            col_j = jax.lax.broadcasted_iota(jnp.int32, (kgd, ncp), 1)
            cmask = (row_q >= col_j) & (col_j < n_cand)
            _merge(kct, vct, None, None, cmask[None])
        l_fin = l_s[...]
        l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
        accn = acc_s[...] / jnp.broadcast_to(l_safe[:, :1], (hkr, d))
        # un-fold (KVH, K, G, D) -> (K, KVH, G, D) = (K, H, D): a tiny
        # (<=64KB f32) leading-dim transpose, once per item per layer
        o4 = jnp.transpose(accn.reshape(hk, fold_k, groups, d),
                           (1, 0, 2, 3))
        o_ref[...] = o4.reshape(fold_k, h, d).astype(o_ref.dtype)


def fold_budget_ok(
    hk: int, sg: int, d: int, gen_itemsize: int,
    kp_itemsize: int, quantized4: bool, gen_blocks: int,
) -> bool:
    """Scoped-VMEM feasibility for the folded kernel: like
    fused_budget_ok but the resident gen blocks carry `gen_blocks` rows
    (fold_k per-beam caches, or 1 when shared)."""
    vmem_mb = int(os.environ.get("HALVA_SCOPED_VMEM_MB", "16"))
    gran = 256 if quantized4 else 128
    kv_row_bytes = hk * d * (1 if quantized4 else 2 * kp_itemsize)
    gen_blk = 2 * 2 * gen_blocks * hk * sg * d * gen_itemsize
    return (vmem_mb - 3) * 2**20 - gen_blk >= 2 * gran * kv_row_bytes


def fold_attend_layer(
    q: jnp.ndarray,  # (B, K, H, Dh) — beams or verify candidates
    prompt_cache,  # as decode_attend_layer (B item rows)
    prompt_seg: jnp.ndarray,  # (B, Sp)
    gen_cache,  # rows B*K (per-beam) or B (shared_gen)
    gen_valid: jnp.ndarray,  # (B*K, Sg) or (B, Sg)
    layer: jnp.ndarray,  # () int32
    fold_k: int,
    shared_gen: bool = False,
    candidates=None,  # (kc, vc) each (B, K, KVH, Dh) fresh roped KVs
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Folded multi-query decode attention: the K queries of each item
    ride ONE batched dot against the item's prompt/gen caches (see
    _fold_kernel). Returns (B, K, H, Dh).

    Beam search (shared_gen=False): row (b, k) attends item b's prompt
    plus beam row b*K+k's gen cache under its own gen_valid — the
    round-4 beam-grid kernel's semantics row-for-row, same block
    sequence and merge order; only dot-reduction-order rounding may
    differ (<= 1 bf16 ulp,
    tests/test_decode_attention.py::test_fold_matches_grid_beams).

    Speculative verify (shared_gen=True, candidates=(kc, vc)): row
    (b, k) attends item b's prompt, the SHARED gen cache under item b's
    gen_valid, and candidates j <= k — the fused counterpart of the XLA
    oracle models/llama.py:_verify_attend."""
    quantized4 = "k4" in prompt_cache
    kp = prompt_cache["k4"] if quantized4 else prompt_cache["k"]
    gen_k, gen_v = gen_cache["k"], gen_cache["v"]
    if quantized4:
        L, bb, hk, _s2, d = kp.shape
        sp = prompt_seg.shape[1]
    else:
        L, bb, hk, sp, d = kp.shape
    b, k_, h, dh = q.shape
    assert b == bb and k_ == fold_k, (q.shape, kp.shape, fold_k)
    assert h % hk == 0, (h, hk)
    groups = h // hk
    gb = 1 if shared_gen else fold_k
    assert gen_k.shape[1] == bb * gb, (gen_k.shape, bb, gb)
    assert gen_valid.shape[0] == bb * gb
    sg = gen_k.shape[3]
    scale = dh**-0.5
    lanes = 128
    quantized = (not quantized4) and "k_scale" in prompt_cache
    quantized_gen = "k_scale" in gen_cache

    # fold the queries: (B, K, H, D) -> (B, KVH, K*G, D), row = sub*G+g
    qf = jnp.transpose(
        q.reshape(bb, fold_k, hk, groups, dh), (0, 2, 1, 3, 4)
    ).reshape(bb, hk, fold_k * groups, dh)

    # block-size plan: as decode_attend_layer, with the gen blocks gb x
    # and the (small) q/candidate blocks charged to the budget
    gran = 256 if quantized4 else 128
    kv_row_bytes = hk * d * (
        1 if quantized4 else (2 * kp.dtype.itemsize)
    )
    vmem_mb = int(os.environ.get("HALVA_SCOPED_VMEM_MB", "16"))
    gen_blk = 2 * 2 * gb * hk * sg * d * gen_k.dtype.itemsize
    extra = (
        2 * hk * fold_k * groups * dh * 2  # q block (bf16)
        + (2 * 2 * hk * lanes * dh * 2 if candidates is not None else 0)
    )
    budget = (vmem_mb - 3) * 2**20 - gen_blk - extra
    cap = max(gran, (budget // (2 * kv_row_bytes)) // gran * gran)
    if block_k != DEFAULT_BLOCK_K:
        cap = max(gran, min(cap, block_k // gran * gran))
    sp_eff = -(-sp // gran) * gran
    nb = pl.cdiv(sp_eff, cap)
    bk = min(cap, -(-(sp_eff // gran) // nb) * gran)

    if quantized4:
        ks, vs = prompt_cache["k_scale"], prompt_cache["v_scale"]
        s_spec = pl.BlockSpec(
            (1, 1, 2, hk, bk // 2),
            lambda it, ki, li: (li[0], it, 0, 0, ki),
        )
        kv_spec = pl.BlockSpec(
            (1, 1, hk, bk // 2, d),
            lambda it, ki, li: (li[0], it, 0, ki, 0),
        )
        seg_spec = pl.BlockSpec(
            (1, 2, bk // 2), lambda it, ki, li: (it, 0, ki)
        )
        seg_in = seg_even_odd(prompt_seg.astype(jnp.int32))
    else:
        if quantized:
            ks, vs = prompt_cache["k_scale"], prompt_cache["v_scale"]
            s_spec = pl.BlockSpec(
                (1, 1, hk, bk), lambda it, ki, li: (li[0], it, 0, ki)
            )
        else:
            ks = jnp.ones((1, 1, hk, 1), jnp.bfloat16)
            vs = ks
            s_spec = pl.BlockSpec(
                (1, 1, hk, 1), lambda it, ki, li: (0, 0, 0, 0)
            )
        kv_spec = pl.BlockSpec(
            (1, 1, hk, bk, d), lambda it, ki, li: (li[0], it, 0, ki, 0)
        )
        seg_spec = pl.BlockSpec(
            (1, 1, bk), lambda it, ki, li: (it, 0, ki)
        )
        seg_in = prompt_seg.astype(jnp.int32)[:, None, :]
    if quantized_gen:
        gks, gvs = gen_cache["k_scale"], gen_cache["v_scale"]
        gs_spec = pl.BlockSpec(
            (1, gb, hk, sg), lambda it, ki, li: (li[0], it, 0, 0)
        )
    else:
        gks = jnp.ones((1, 1, hk, 1), jnp.bfloat16)
        gvs = gks
        gs_spec = pl.BlockSpec(
            (1, 1, hk, 1), lambda it, ki, li: (0, 0, 0, 0)
        )
    n_cand = 0
    if candidates is not None:
        kc, vc = candidates
        n_cand = fold_k
        # lane-pad the candidate columns: a 128-multiple minor dim keeps
        # every in-kernel op on the candidate block layout-legal
        ncp = lanes
        assert fold_k <= ncp, fold_k
        kc_t = jnp.zeros((bb, hk, ncp, dh), q.dtype).at[
            :, :, :fold_k
        ].set(jnp.transpose(kc, (0, 2, 1, 3)).astype(q.dtype))
        vc_t = jnp.zeros((bb, hk, ncp, dh), q.dtype).at[
            :, :, :fold_k
        ].set(jnp.transpose(vc, (0, 2, 1, 3)).astype(q.dtype))
        c_spec = pl.BlockSpec(
            (1, hk, ncp, d), lambda it, ki, li: (it, 0, 0, 0)
        )
    else:
        kc_t = jnp.zeros((1, hk, 1, dh), q.dtype)
        vc_t = kc_t
        c_spec = pl.BlockSpec(
            (1, hk, 1, d), lambda it, ki, li: (0, 0, 0, 0)
        )

    kernel = functools.partial(
        _fold_kernel,
        scale=scale,
        quantized=quantized,
        quantized4=quantized4,
        quantized_gen=quantized_gen,
        nblocks=nb,
        sp=sp,
        block_k=bk,
        lanes=lanes,
        groups=groups,
        fold_k=fold_k,
        shared_gen=shared_gen,
        n_cand=n_cand,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bb, nb),
        in_specs=[
            pl.BlockSpec(
                (1, hk, fold_k * groups, d),
                lambda it, ki, li: (it, 0, 0, 0),
            ),
            kv_spec,
            kv_spec,
            seg_spec,
            s_spec,
            s_spec,
            pl.BlockSpec(
                (1, gb, hk, sg, d),
                lambda it, ki, li: (li[0], it, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, gb, hk, sg, d),
                lambda it, ki, li: (li[0], it, 0, 0, 0),
            ),
            gs_spec,
            gs_spec,
            pl.BlockSpec(
                (gb, 1, sg), lambda it, ki, li: (it, 0, 0)
            ),
            c_spec,
            c_spec,
        ],
        out_specs=pl.BlockSpec(
            (fold_k, h, d), lambda it, ki, li: (it, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((hk * fold_k * groups, d), jnp.float32),
            pltpu.VMEM((hk * fold_k * groups, lanes), jnp.float32),
            pltpu.VMEM((hk * fold_k * groups, lanes), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bb * fold_k, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interp(),
    )(
        jnp.reshape(layer.astype(jnp.int32), (1,)),
        qf,
        kp,
        prompt_cache["v4"] if quantized4 else prompt_cache["v"],
        seg_in,
        ks,
        vs,
        gen_k,
        gen_v,
        gks,
        gvs,
        gen_valid.astype(jnp.int32)[:, None, :],
        kc_t,
        vc_t,
    )
    return out.reshape(bb, fold_k, h, d)


def decode_attend_layer(
    q: jnp.ndarray,  # (B, 1, H, Dh)
    prompt_cache,  # {k, v: (L, B, H, Sp, Dh) int8|bf16,
    #                [k_scale, v_scale: (L, B, H, Sp) bf16]}
    prompt_seg: jnp.ndarray,  # (B, Sp)
    gen_cache,  # {k, v: (L, B, H, Sg, Dh) bf16|int8,
    #             [k_scale, v_scale: (L, B, H, Sg) bf16]}
    gen_valid: jnp.ndarray,  # (B, Sg) bool
    layer: jnp.ndarray,  # () int32 — layer's cache slice to use
    block_k: int = DEFAULT_BLOCK_K,
    beam_k: int = 1,
) -> jnp.ndarray:
    """One decode-attention layer over the stacked caches, merged prompt
    + generated softmax, normalized output (B, 1, H, Dh). The layer
    index rides a scalar-prefetch argument into the BlockSpec index
    maps, so no per-layer XLA slice of the caches is ever materialized
    (a 96MB copy per layer per step at llava-7b b24).

    beam_k > 1 (beam search): q / gen cache / gen_valid carry B*K beam
    rows; the read-only PROMPT operands (cache, scales, seg) stay at B
    item rows. The grid becomes (items, kv-blocks, beams) with the beam
    index innermost and prompt index maps that ignore it, so the prompt
    KV is neither duplicated in HBM nor re-STREAMED per beam: Pallas
    skips re-fetching blocks whose index didn't change between
    consecutive grid steps, and each beam accumulates into its own
    leading-dim slab of the softmax scratch."""
    quantized4 = "k4" in prompt_cache
    kp = prompt_cache["k4"] if quantized4 else prompt_cache["k"]
    gen_k, gen_v = gen_cache["k"], gen_cache["v"]
    if quantized4:
        L, bp_rows, hk, _s2, d = kp.shape
        sp = prompt_seg.shape[1]  # true (unpacked) prompt length
    else:
        L, bp_rows, hk, sp, d = kp.shape
    b = q.shape[0]  # beam rows (== bp_rows unless beam_k > 1)
    assert bp_rows * beam_k == b, (kp.shape, q.shape, beam_k)
    if (
        beam_k > 1
        and os.environ.get("HALVA_BEAM_DOT", "fold") == "fold"
        and fold_budget_ok(
            hk, gen_k.shape[3], q.shape[3], gen_k.dtype.itemsize,
            kp.dtype.itemsize, quantized4, beam_k,
        )
    ):
        # fold the K beams into the batched dot's row dimension — one
        # MXU pass per (item, block) instead of K (see _fold_kernel).
        # Same block sequence and merge order as the beam-grid path
        # below; only dot-reduction-order rounding can differ (<= 1
        # bf16 ulp). HALVA_BEAM_DOT=grid keeps the old path for A/B.
        out = fold_attend_layer(
            q[:, 0].reshape(bp_rows, beam_k, q.shape[2], q.shape[3]),
            prompt_cache, prompt_seg, gen_cache, gen_valid, layer,
            fold_k=beam_k, block_k=block_k,
        )
        return out.reshape(b, 1, q.shape[2], q.shape[3])
    # Index maps are written over (item, beam_row, kv_block, layer_ref).
    # beam_k == 1: the grid is (rows, blocks). beam_k > 1: the grid is
    # (items, blocks, beams) with the beam index INNERMOST, and prompt-
    # side operands ignore it — consecutive beam steps then present the
    # same prompt block index and Pallas's pipeline skips the re-fetch,
    # so the dominant prompt-KV traffic streams once per ITEM, not once
    # per beam (round-3's measured ~25% K-fold re-streaming share).
    if beam_k == 1:
        def adapt(f):
            return lambda bi, ki, li: f(bi, bi, ki, li)
    else:
        def adapt(f):
            return lambda bi, ki, bj, li: f(bi, bi * beam_k + bj, ki, li)
    sg = gen_k.shape[3]
    dh = q.shape[3]
    h = q.shape[2]  # query heads; GQA: caches carry hk = h // groups
    assert h % hk == 0, (h, hk)
    groups = h // hk
    scale = dh**-0.5
    lanes = 128
    quantized = (not quantized4) and "k_scale" in prompt_cache
    quantized_gen = "k_scale" in gen_cache

    # Block-size choice. Constraints: the scales/seg blocks carry bk on
    # the LANE dim, so bk must be a 128-multiple (int4: bk/2 on the lane
    # dim -> 256-multiple). Objective: minimize PADDED rows — rounding
    # sp=623 up to 512-multiples made every (row, layer) stream 1024
    # cache rows for 623 real ones, 61% useful KV traffic (the measured
    # ~1.6x gap of decode attention vs its HBM floor,
    # scripts/profile_decode.py noattn variant). So: round sp up to the
    # granule, split into the fewest blocks whose DOUBLE-BUFFERED k+v
    # (+ resident gen-cache blocks) fit the ~16MB scoped-VMEM stack
    # (bigger blocks fail remote compile: measured at bk=1024 int8 and
    # at bk=512 bf16, "exceeded scoped vmem limit").
    gran = 256 if quantized4 else 128
    kv_row_bytes = hk * d * (
        1 if quantized4 else (2 * kp.dtype.itemsize)
    )  # k+v bytes per cache token in one block (int4: 2 x 0.5 packed)

    # rows-per-grid-step: fatter steps amortize the per-step pipeline
    # overhead (see the kernel comment), but multiply the VMEM
    # footprint; only worth it under a raised scoped-VMEM compile
    # budget, so it keys off the same env knob the entry points use to
    # set --xla_tpu_scoped_vmem_limit_kib (HALVA_SCOPED_VMEM_MB). Rows
    # must divide the batch; beams keep rows=1 (their inner grid dim
    # already amortizes the prompt fetch).
    vmem_mb = int(os.environ.get("HALVA_SCOPED_VMEM_MB", "16"))
    rows = 1
    if beam_k == 1 and vmem_mb > 16:
        want = int(os.environ.get("HALVA_DECODE_ROWS", "4"))
        while want > 1 and b % want:
            want -= 1
        rows = max(1, want)

    def plan(rows_):
        gen_blk = 2 * 2 * rows_ * hk * sg * d * gen_k.dtype.itemsize
        budget = (vmem_mb - 3) * 2**20 - gen_blk
        cap_ = (budget // (2 * rows_ * kv_row_bytes)) // gran * gran
        return cap_

    cap = plan(rows)
    while rows > 1 and cap < gran:  # rows blow the budget -> shrink
        rows //= 2
        cap = plan(rows)
    cap = max(gran, cap)
    if block_k != DEFAULT_BLOCK_K:  # explicit caller override
        cap = max(gran, min(cap, block_k // gran * gran))
    sp_eff = -(-sp // gran) * gran
    nb = pl.cdiv(sp_eff, cap)
    bk = min(cap, -(-(sp_eff // gran) // nb) * gran)
    # NOTE: scalar-prefetch refs arrive AFTER the grid indices in
    # index_map signatures: (bi, ki, li_ref)
    if quantized4:
        # packed values: bk tokens = bk//2 byte rows; scales carry the
        # even/odd plane on a leading dim (L, B, 2, H, S/2)
        ks, vs = prompt_cache["k_scale"], prompt_cache["v_scale"]
        s_spec = pl.BlockSpec(
            (1, rows, 2, hk, bk // 2),
            adapt(lambda it, br, ki, li: (li[0], it, 0, 0, ki)),
        )
    elif quantized:
        ks, vs = prompt_cache["k_scale"], prompt_cache["v_scale"]
        s_spec = pl.BlockSpec(
            (1, rows, hk, bk),
            adapt(lambda it, br, ki, li: (li[0], it, 0, ki)),
        )
    else:
        ks = jnp.ones((1, 1, hk, 1), jnp.bfloat16)
        vs = ks
        s_spec = pl.BlockSpec(
            (1, 1, hk, 1), adapt(lambda it, br, ki, li: (0, 0, 0, 0))
        )
    if quantized_gen:
        gks, gvs = gen_cache["k_scale"], gen_cache["v_scale"]
        gs_spec = pl.BlockSpec(
            (1, rows, hk, sg),
            adapt(lambda it, br, ki, li: (li[0], br, 0, 0)),
        )
    else:
        gks = jnp.ones((1, 1, hk, 1), jnp.bfloat16)
        gvs = gks
        gs_spec = pl.BlockSpec(
            (1, 1, hk, 1), adapt(lambda it, br, ki, li: (0, 0, 0, 0))
        )

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        quantized=quantized,
        quantized4=quantized4,
        quantized_gen=quantized_gen,
        nblocks=nb,
        sp=sp,
        block_k=bk,
        lanes=lanes,
        groups=groups,
        beams=beam_k,
        rows=rows,
    )
    if quantized4:
        kv_spec = pl.BlockSpec(
            (1, rows, hk, bk // 2, d),
            adapt(lambda it, br, ki, li: (li[0], it, 0, ki, 0)),
        )
        seg_spec = pl.BlockSpec(
            (rows, 2, bk // 2), adapt(lambda it, br, ki, li: (it, 0, ki))
        )
        seg_in = seg_even_odd(prompt_seg.astype(jnp.int32))
    else:
        kv_spec = pl.BlockSpec(
            (1, rows, hk, bk, d),
            adapt(lambda it, br, ki, li: (li[0], it, 0, ki, 0)),
        )
        seg_spec = pl.BlockSpec(
            (rows, 1, bk), adapt(lambda it, br, ki, li: (it, 0, ki))
        )
        seg_in = prompt_seg.astype(jnp.int32)[:, None, :]
    grid = (b // rows, nb) if beam_k == 1 else (bp_rows, nb, beam_k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rows, h, d), adapt(lambda it, br, ki, li: (br, 0, 0))
            ),
            kv_spec,
            kv_spec,
            seg_spec,
            s_spec,
            s_spec,
            pl.BlockSpec(
                (1, rows, hk, sg, d),
                adapt(lambda it, br, ki, li: (li[0], br, 0, 0, 0)),
            ),
            pl.BlockSpec(
                (1, rows, hk, sg, d),
                adapt(lambda it, br, ki, li: (li[0], br, 0, 0, 0)),
            ),
            gs_spec,
            gs_spec,
            pl.BlockSpec(
                (rows, 1, sg), adapt(lambda it, br, ki, li: (br, 0, 0))
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows, h, d), adapt(lambda it, br, ki, li: (br, 0, 0))
        ),
        scratch_shapes=[
            pltpu.VMEM((beam_k * rows, h, d), jnp.float32),
            pltpu.VMEM((beam_k * rows, h, lanes), jnp.float32),
            pltpu.VMEM((beam_k * rows, h, lanes), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        # item rows are independent (megacore-parallel); the kv-block
        # dim accumulates in scratch and must stay sequential, and so
        # must the beam dim (beams share the block fetch)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")[
                : len(grid)
            ],
        ),
        interpret=_interp(),
    )(
        jnp.reshape(layer.astype(jnp.int32), (1,)),
        q[:, 0],
        kp,
        prompt_cache["v4"] if quantized4 else prompt_cache["v"],
        seg_in,
        ks,
        vs,
        gen_k,
        gen_v,
        gks,
        gvs,
        gen_valid.astype(jnp.int32)[:, None, :],
    )
    return out[:, None]  # (B, 1, H, D)
