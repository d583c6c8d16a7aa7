"""Fused int8 matmul vs dequant reference (interpret/XLA path on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from halva_tpu.ops.int8_matmul import int8_matmul
from halva_tpu.ops.quant import quantize_kernel


def _ref(x, q, scale):
    w = q.astype(np.float32) * np.asarray(scale).reshape(1, -1)
    return np.asarray(x, np.float32) @ w


def test_int8_matmul_matches_dequant():
    rng = np.random.RandomState(0)
    x = rng.randn(14, 64).astype(np.float32)
    w = rng.randn(64, 96).astype(np.float32) * 0.1
    qd = quantize_kernel(jnp.asarray(w))
    got = np.asarray(
        int8_matmul(
            jnp.asarray(x),
            qd["kernel_q"],
            qd["kernel_scale"].astype(jnp.float32),
        )
    )
    want = _ref(x, np.asarray(qd["kernel_q"]),
                np.asarray(qd["kernel_scale"], np.float32))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


def test_int8_matmul_3d_input():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 32).astype(np.float32)
    q = rng.randint(-127, 128, (32, 48), dtype=np.int8)
    s = np.full((1, 48), 0.01, np.float32)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s)))
    want = _ref(x.reshape(-1, 32), q, s).reshape(2, 5, 48)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)
