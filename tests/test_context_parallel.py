"""Context (sequence) parallelism: the q_offset flash-kernel hook and the
shard_map all-gather-KV attention (parallel/context.py) vs the XLA
reference / single-device flash kernel — forward and gradients, on the
8-device CPU mesh (tests/conftest.py).

Beyond-reference capability: the reference (pritamqu/HALVA) trains 2k
sequences with ZeRO-3 only; this covers the 16k+ RoPE-extended VILA
regime where activations must shard over sequence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from halva_tpu.ops.attention import attention_reference, make_attention_mask
from halva_tpu.ops.flash_attention import flash_attention
from halva_tpu.parallel.context import (
    context_parallel_attention,
    cp_flash_attention,
)


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def _ref(q, k, v, q_seg, kv_seg, causal=True, window=None):
    mask = make_attention_mask(
        q_seg, kv_seg, causal=causal, sliding_window=window
    )
    return attention_reference(q, k, v, mask=mask)


def _seq_mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("seq",))


# ---------------------------------------------------------------- q_offset


def test_q_offset_equals_full_slice():
    """A q shard computed with q_offset must equal the same rows of the
    full-sequence attention (the context-parallel contract)."""
    b, s, h, d = 2, 256, 4, 32
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand(
        (b, s, h, d), 2
    )
    seg = jnp.ones((b, s), jnp.int32)
    want = _ref(q, k, v, seg, seg)
    for off in (0, 64, 192):
        got = flash_attention(
            q[:, off : off + 64],
            k,
            v,
            seg[:, off : off + 64],
            seg,
            causal=True,
            q_offset=jnp.int32(off),
            block_q=64,
            block_k=128,
        )
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(want[:, off : off + 64]),
            atol=2e-5,
            rtol=2e-5,
        )


def test_q_offset_grads():
    b, s, h, d = 1, 256, 2, 32
    q, k, v = _rand((b, s, h, d), 3), _rand((b, s, h, d), 4), _rand(
        (b, s, h, d), 5
    )
    seg = jnp.ones((b, s), jnp.int32)
    off, sl = 128, 64
    w = _rand((b, sl, h, d), 6)

    def f(q_, k_, v_):
        o = flash_attention(
            q_[:, off : off + sl],
            k_,
            v_,
            seg[:, off : off + sl],
            seg,
            causal=True,
            q_offset=jnp.int32(off),
            block_q=64,
            block_k=64,
        )
        return jnp.sum(o * w)

    def g(q_, k_, v_):
        return jnp.sum(_ref(q_, k_, v_, seg, seg)[:, off : off + sl] * w)

    ga = jax.grad(f, (0, 1, 2))(q, k, v)
    gb = jax.grad(g, (0, 1, 2))(q, k, v)
    for a, b_ in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=3e-5
        )


# ------------------------------------------------------------ shard_map CP


def test_cp_forward_packed_and_padded():
    """4-way CP over a packed row with a padded tail: valid positions
    match the XLA reference; sharding must not leak across segment or
    shard borders."""
    b, s, h, d = 2, 256, 4, 32
    q, k, v = _rand((b, s, h, d), 7), _rand((b, s, h, d), 8), _rand(
        (b, s, h, d), 9
    )
    seg = np.ones((b, s), np.int32)
    seg[:, 100:200] = 2
    seg[:, 240:] = 0
    seg = jnp.asarray(seg)
    got = context_parallel_attention(_seq_mesh(), q, k, v, seg, seg)
    want = _ref(q, k, v, seg, seg)
    m = np.asarray(seg) != 0
    np.testing.assert_allclose(
        np.asarray(got)[m], np.asarray(want)[m], atol=2e-5, rtol=2e-5
    )


def test_cp_grads_match_single_device():
    """CP grads == single-device flash grads (cotangent zeroed at padded
    rows — the reference emits uniform rows there; callers mask)."""
    b, s, h, d = 2, 256, 2, 32
    q, k, v = _rand((b, s, h, d), 10), _rand((b, s, h, d), 11), _rand(
        (b, s, h, d), 12
    )
    seg = np.ones((b, s), np.int32)
    seg[:, 200:] = 0
    seg = jnp.asarray(seg)
    w = _rand((b, s, h, d), 13) * (np.asarray(seg) != 0)[:, :, None, None]
    mesh = _seq_mesh()

    def f_cp(q_, k_, v_):
        return jnp.sum(
            context_parallel_attention(mesh, q_, k_, v_, seg, seg) * w
        )

    def f_single(q_, k_, v_):
        return jnp.sum(
            flash_attention(
                q_, k_, v_, seg, seg, causal=True, block_q=64, block_k=64
            )
            * w
        )

    ga = jax.grad(f_cp, (0, 1, 2))(q, k, v)
    gb = jax.grad(f_single, (0, 1, 2))(q, k, v)
    for a, b_ in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=3e-5
        )


def test_cp_gqa_and_window():
    """GQA (kv heads < q heads) + sliding window through the CP path."""
    b, s, h, kvh, d = 1, 256, 4, 2, 32
    q = _rand((b, s, h, d), 14)
    k = _rand((b, s, kvh, d), 15)
    v = _rand((b, s, kvh, d), 16)
    seg = jnp.ones((b, s), jnp.int32)
    got = context_parallel_attention(
        _seq_mesh(), q, k, v, seg, seg, sliding_window=96
    )
    want = _ref(q, k, v, seg, seg, window=96)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_cp_batch_and_seq_axes():
    """2x4 (data, seq) mesh: batch and sequence sharded together."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    b, s, h, d = 2, 128, 2, 32
    q, k, v = _rand((b, s, h, d), 17), _rand((b, s, h, d), 18), _rand(
        (b, s, h, d), 19
    )
    seg = jnp.ones((b, s), jnp.int32)
    got = context_parallel_attention(
        mesh, q, k, v, seg, seg, batch_axis="data"
    )
    want = _ref(q, k, v, seg, seg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_cp_body_requires_axis():
    """cp_flash_attention is a per-shard body: calling it outside
    shard_map must fail loudly (axis name unbound), not silently
    compute wrong offsets."""
    b, s, h, d = 1, 64, 2, 32
    q = _rand((b, s, h, d), 20)
    seg = jnp.ones((b, s), jnp.int32)
    with pytest.raises(Exception):
        cp_flash_attention(q, q, q, seg, seg)
