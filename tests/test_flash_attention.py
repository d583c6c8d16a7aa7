"""Pallas flash attention vs XLA reference (interpret mode on CPU):
forward and gradients, causal/padding/packing/GQA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halva_tpu.ops.attention import attention_reference, make_attention_mask
from halva_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def _ref(q, k, v, q_seg, kv_seg, causal):
    mask = make_attention_mask(q_seg, kv_seg, causal=causal)
    return attention_reference(q, k, v, mask=mask)


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_reference(causal):
    b, s, h, d = 2, 256, 4, 32
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand(
        (b, s, h, d), 2
    )
    seg = jnp.ones((b, s), jnp.int32)
    got = flash_attention(q, k, v, seg, seg, causal=causal)
    want = _ref(q, k, v, seg, seg, causal)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_forward_padding():
    b, s, h, d = 2, 192, 2, 32
    q, k, v = _rand((b, s, h, d), 3), _rand((b, s, h, d), 4), _rand(
        (b, s, h, d), 5
    )
    seg = np.ones((b, s), np.int32)
    seg[0, 100:] = 0
    seg[1, 50:] = 0
    seg = jnp.asarray(seg)
    got = flash_attention(q, k, v, seg, seg, causal=True)
    want = _ref(q, k, v, seg, seg, True)
    m = np.asarray(seg) != 0
    np.testing.assert_allclose(
        np.asarray(got)[m], np.asarray(want)[m], atol=2e-5, rtol=2e-5
    )


def test_forward_packed_segments():
    """Two documents packed in one row must not attend across the border."""
    b, s, h, d = 1, 256, 2, 32
    q, k, v = _rand((b, s, h, d), 6), _rand((b, s, h, d), 7), _rand(
        (b, s, h, d), 8
    )
    seg = np.ones((b, s), np.int32)
    seg[0, 130:] = 2
    seg = jnp.asarray(seg)
    got = flash_attention(q, k, v, seg, seg, causal=True)
    want = _ref(q, k, v, seg, seg, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_forward_gqa():
    b, s, h, kvh, d = 1, 128, 8, 2, 32
    q = _rand((b, s, h, d), 9)
    k = _rand((b, s, kvh, d), 10)
    v = _rand((b, s, kvh, d), 11)
    seg = jnp.ones((b, s), jnp.int32)
    got = flash_attention(q, k, v, seg, seg, causal=True)
    want = _ref(q, k, v, seg, seg, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_forward_non_multiple_length():
    b, s, h, d = 1, 200, 2, 32  # not a multiple of 128
    q, k, v = _rand((b, s, h, d), 12), _rand((b, s, h, d), 13), _rand(
        (b, s, h, d), 14
    )
    seg = jnp.ones((b, s), jnp.int32)
    got = flash_attention(q, k, v, seg, seg, causal=True)
    want = _ref(q, k, v, seg, seg, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("causal", [True, False])
def test_grads_match_reference(causal):
    b, s, h, d = 1, 256, 2, 32
    q, k, v = _rand((b, s, h, d), 15), _rand((b, s, h, d), 16), _rand(
        (b, s, h, d), 17
    )
    seg = np.ones((b, s), np.int32)
    seg[0, 220:] = 0
    # random cotangent, zeroed at padded rows: the reference path emits
    # uniform-softmax garbage for fully-masked rows while flash emits 0,
    # so only valid positions are comparable (callers mask them anyway).
    w = _rand((b, s, h, d), 18) * (seg != 0)[..., None, None]
    seg = jnp.asarray(seg)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, seg, seg, causal=causal) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, seg, seg, causal) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-4
        )


def test_grads_gqa():
    b, s, h, kvh, d = 1, 128, 4, 2, 32
    q = _rand((b, s, h, d), 19)
    k = _rand((b, s, kvh, d), 20)
    v = _rand((b, s, kvh, d), 21)
    seg = jnp.ones((b, s), jnp.int32)
    w = _rand((b, s, h, d), 22)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, seg, seg, causal=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, seg, seg, True) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-4
        )


def test_alibi_in_kernel_matches_reference():
    """In-kernel ALiBi (the reference Triton kernel's capability,
    mpt/flash_attn_triton.py) vs the XLA additive-bias path."""
    from halva_tpu.ops.attention import alibi_bias

    b, s, h, d = 2, 192, 4, 32
    q, k, v = _rand((b, s, h, d), 11), _rand((b, s, h, d), 12), _rand(
        (b, s, h, d), 13
    )
    seg = np.ones((b, s), np.int32)
    seg[1, 150:] = 0
    seg = jnp.asarray(seg)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))

    got = flash_attention(q, k, v, seg, seg, causal=True, alibi=True)
    mask = make_attention_mask(seg, seg, causal=True)
    want = attention_reference(
        q, k, v, mask=mask, bias=alibi_bias(h, pos, pos)
    )
    m = np.asarray(seg) != 0
    np.testing.assert_allclose(
        np.asarray(got)[m], np.asarray(want)[m], atol=3e-5, rtol=3e-5
    )


def test_alibi_grads_match_reference():
    from halva_tpu.ops.attention import alibi_bias

    b, s, h, d = 1, 128, 4, 16
    q, k, v = _rand((b, s, h, d), 14), _rand((b, s, h, d), 15), _rand(
        (b, s, h, d), 16
    )
    seg = jnp.ones((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))

    def f_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, seg, seg, causal=True, alibi=True)
        )

    def f_ref(q, k, v):
        mask = make_attention_mask(seg, seg, causal=True)
        return jnp.sum(
            attention_reference(
                q, k, v, mask=mask, bias=alibi_bias(h, pos, pos)
            )
        )

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-4
        )


def test_sliding_window_matches_reference():
    b, s, h, d = 2, 256, 2, 32
    w = 64
    q, k, v = _rand((b, s, h, d), 17), _rand((b, s, h, d), 18), _rand(
        (b, s, h, d), 19
    )
    seg = jnp.ones((b, s), jnp.int32)
    got = flash_attention(
        q, k, v, seg, seg, causal=True, sliding_window=w
    )
    mask = make_attention_mask(seg, seg, causal=True, sliding_window=w)
    want = attention_reference(q, k, v, mask=mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_sliding_window_block_skip_fwd_and_grads():
    """Shapes chosen so the kernels' window block-skip lower bounds are
    actually live (kv_block_lo > 0 for late q blocks in fwd/dq; dkv's
    num_q_blocks clamp bites for early kv blocks): s=512 w=128 with
    128-row blocks gives 4x4 blocks where e.g. q block 3 skips kv
    blocks 0-1 entirely."""
    b, s, h, d = 1, 512, 2, 32
    w = 128
    q, k, v = _rand((b, s, h, d), 23), _rand((b, s, h, d), 24), _rand(
        (b, s, h, d), 25
    )
    seg = jnp.ones((b, s), jnp.int32)
    ct = _rand((b, s, h, d), 26)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(
                q, k, v, seg, seg, causal=True, sliding_window=w,
                block_q=128, block_k=128,
            )
            * ct
        )

    def loss_ref(q, k, v):
        mask = make_attention_mask(seg, seg, causal=True, sliding_window=w)
        return jnp.sum(attention_reference(q, k, v, mask=mask) * ct)

    got = flash_attention(
        q, k, v, seg, seg, causal=True, sliding_window=w,
        block_q=128, block_k=128,
    )
    mask = make_attention_mask(seg, seg, causal=True, sliding_window=w)
    want = attention_reference(q, k, v, mask=mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-4
        )


def test_sliding_window_skip_with_q_offset():
    """Window block-skip must use GLOBAL q rows when q_offset shifts the
    local shard (context parallelism): local q row 0 at global offset
    384 with w=128 sees only kv cols 257..384."""
    b, s, h, d = 1, 512, 2, 32
    w = 128
    off = 384
    sq = 128
    q = _rand((b, sq, h, d), 27)
    k, v = _rand((b, s, h, d), 28), _rand((b, s, h, d), 29)
    qseg = jnp.ones((b, sq), jnp.int32)
    kseg = jnp.ones((b, s), jnp.int32)
    got = flash_attention(
        q, k, v, qseg, kseg, causal=True, sliding_window=w,
        block_q=128, block_k=128, q_offset=jnp.int32(off),
    )
    pos_q = jnp.arange(off, off + sq)
    pos_k = jnp.arange(s)
    mask = (
        (pos_q[:, None] >= pos_k[None, :])
        & (pos_q[:, None] - pos_k[None, :] < w)
    )[None]
    want = attention_reference(q, k, v, mask=mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_alibi_non_pow2_heads_rejected():
    b, s, h, d = 1, 64, 3, 16
    q = _rand((b, s, h, d), 20)
    seg = jnp.ones((b, s), jnp.int32)
    with pytest.raises(ValueError, match="power-of-two"):
        flash_attention(q, q, q, seg, seg, causal=True, alibi=True)
