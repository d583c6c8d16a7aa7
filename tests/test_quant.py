"""Weight-only int8 + W8A8: numeric closeness + end-to-end decode works."""

import numpy as np

import pytest

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAMA_TINY, LLAVA_TINY
from halva_tpu.constants import IMAGE_TOKEN_INDEX
from halva_tpu.models import llama, llava
from halva_tpu.ops import quant as quant_lib
from halva_tpu.ops.quant import (
    dequantize_kernel,
    int8_dense,
    quantize_kernel,
    quantize_params,
)


@pytest.fixture(params=[False, True], ids=["w8", "w8a8"])
def w8a8_mode(request):
    """Run int8 model tests under both execution modes."""
    prev = quant_lib._W8A8
    quant_lib.set_w8a8(request.param)
    yield request.param
    quant_lib._W8A8 = prev


def test_int8_dense_close_to_fp():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 96), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (96, 64)) * 0.05
    p = quantize_kernel(w)
    ref = np.asarray(jnp.dot(x, w))
    got = np.asarray(int8_dense(x, p["kernel_q"], p["kernel_scale"]))
    denom = np.abs(ref).max()
    # two int8 roundings (activation + weight) stack
    assert np.abs(ref - got).max() / denom < 0.05


def test_quantize_kernel_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    q = quantize_kernel(w)
    assert q["kernel_q"].dtype == jnp.int8
    deq = dequantize_kernel(q, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w)).max()
    # int8 per-channel absmax: max err ~ absmax/127/2 per channel
    bound = float(np.abs(np.asarray(w)).max()) / 127.0
    assert err <= bound + 1e-6


def test_quantized_logits_close(w8a8_mode):
    cfg = LLAMA_TINY
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    ids = np.random.RandomState(0).randint(0, 200, (2, 12))
    full = np.asarray(
        llama.forward(params, cfg, jnp.asarray(ids), attn_impl="xla")
    )
    quant = np.asarray(
        llama.forward(qparams, cfg, jnp.asarray(ids), attn_impl="xla")
    )
    # logits track within a tolerance scaled by their magnitude
    denom = np.abs(full).max()
    assert np.abs(full - quant).max() / denom < 0.1
    # top-1 predictions mostly agree
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree > 0.8


def test_quantized_generate_runs(w8a8_mode):
    from halva_tpu.ops.generate import generate_greedy

    cfg = LLAVA_TINY
    params = quantize_params(
        llava.init_params(jax.random.PRNGKey(0), cfg)
    )
    ids = np.full((1, 6), 5, np.int32)
    ids[0, 1] = IMAGE_TOKEN_INDEX
    imgs = np.zeros(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size), np.float32
    )
    toks, num = generate_greedy(
        params,
        cfg,
        jnp.asarray(ids),
        jnp.asarray(imgs),
        jnp.asarray([6], np.int32),
        max_new_tokens=4,
        eos_id=-1,
        attn_impl="xla",
    )
    assert np.asarray(toks).shape == (1, 4)
    assert int(np.asarray(num)[0]) == 4


def test_quantized_memory_is_smaller():
    params = llama.init_params(jax.random.PRNGKey(0), LLAMA_TINY)
    q = quantize_params(params)

    def nbytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))

    assert nbytes(q) < 0.5 * nbytes(params)
