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


def test_nf4_roundtrip_and_dense():
    from halva_tpu.ops.quant import (
        NF4_CODE, nf4_dense, quantize_kernel_nf4,
    )

    w = jax.random.normal(jax.random.PRNGKey(3), (96, 64)) * 0.08
    q = quantize_kernel_nf4(w)
    assert q["kernel_q4"].dtype == jnp.uint4
    # nearest-code property: normalized error bounded by half the largest
    # code gap times the channel absmax
    code = np.asarray(NF4_CODE)
    max_gap = np.max(np.diff(code)) / 2
    absmax = np.max(np.abs(np.asarray(w)), axis=0)
    deq = np.asarray(
        jnp.take(jnp.asarray(code), q["kernel_q4"].astype(jnp.int32),
                 axis=0)
        * q["kernel_scale4"].astype(jnp.float32)
    )
    # + 1% absmax slack: kernel_scale4 is stored bf16 (~0.4% wobble)
    assert (
        np.abs(deq - np.asarray(w)) <= (max_gap + 0.01) * absmax + 1e-6
    ).all()

    x = jax.random.normal(jax.random.PRNGKey(4), (4, 96), jnp.float32)
    ref = np.asarray(jnp.dot(x, jnp.asarray(deq)))
    got = np.asarray(nf4_dense(x, q["kernel_q4"], q["kernel_scale4"]))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-2)

    # pinned-bwd gradient equals the dequant-matmul gradient
    g = jax.grad(
        lambda x: nf4_dense(x, q["kernel_q4"], q["kernel_scale4"]).sum()
    )(x)
    gref = jax.grad(lambda x: (x @ jnp.asarray(deq)).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=1e-4)


def test_nf4_model_logits_track():
    cfg = LLAMA_TINY
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    q4 = quantize_params(params, bits=4)
    ids = np.random.RandomState(0).randint(0, 200, (2, 12))
    full = np.asarray(
        llama.forward(params, cfg, jnp.asarray(ids), attn_impl="xla")
    )
    quant4 = np.asarray(
        llama.forward(q4, cfg, jnp.asarray(ids), attn_impl="xla")
    )
    denom = np.abs(full).max()
    # 4-bit tracks more loosely than int8 but must stay sane
    assert np.abs(full - quant4).max() / denom < 0.35
    agree = (full.argmax(-1) == quant4.argmax(-1)).mean()
    assert agree > 0.5


def test_nf4_memory_is_quarter():
    params = llama.init_params(jax.random.PRNGKey(0), LLAMA_TINY)
    q4 = quantize_params(params, bits=4, quantize_embed=False)

    def nbytes(t):
        total = 0
        for x in jax.tree.leaves(t):
            bits = 4 if x.dtype == jnp.uint4 else x.dtype.itemsize * 8
            total += x.size * bits / 8
        return total

    base = nbytes(
        {"layers": params["layers"]}
    )
    quant = nbytes({"layers": q4["layers"]})
    assert quant < 0.35 * base


def test_nf4_lora_training_step():
    """QLoRA-4bit: LoRA trains on an NF4 base through the STE-free
    pinned-bwd path."""
    from halva_tpu.train import lora as lora_lib

    cfg = LLAMA_TINY
    params = quantize_params(
        llama.init_params(jax.random.PRNGKey(0), cfg), bits=4,
    )
    params = lora_lib.add_lora(
        params, jax.random.PRNGKey(1), rank=4, alpha=8.0,
        targets=lora_lib.LLM_TARGETS,
    )
    ids = np.random.RandomState(0).randint(0, 200, (2, 10))

    def loss(lora_tree):
        merged = jax.tree.map(lambda x: x, params)
        # graft lora leaves back (same structure)
        def rec(dst, src):
            for k, v in src.items():
                if isinstance(v, dict):
                    rec(dst[k], v)
                else:
                    dst[k] = v
        rec(merged, lora_tree)
        logits = llama.forward(
            merged, cfg, jnp.asarray(ids), attn_impl="xla"
        )
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    lora_only = {
        "layers": {
            "attn": {
                w: {
                    k: params["layers"]["attn"][w][k]
                    for k in ("lora_a", "lora_b", "lora_scale")
                }
                for w in ("wq", "wk", "wv", "wo")
            }
        }
    }
    grads = jax.grad(loss)(lora_only)
    gnorm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)
    )
    assert np.isfinite(gnorm) and gnorm > 0
