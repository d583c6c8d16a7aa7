"""Pallas W4 (int4 weight-only) matmul over stacked per-layer weights.

Serving-decode kernel: llava-7b decode at b24 is weight-bandwidth-bound
(scripts/profile_decode.py: 8.3 ms/step with attention stubbed ~= the
6.7 GB int8 weight read at HBM speed). int8 is already at its byte
floor through XLA (slice+convert+dot fuse), so halving weight bytes
requires 4-bit storage — and a Pallas kernel, because an XLA int4 dot
materializes the bf16 dequant copy (the same trap measured for the int8
KV cache). Like ops/decode_attention.py, the layer index rides a
scalar-prefetch argument so the kernel streams blocks straight from the
stacked (L, K, N) int4 arrays with no per-layer XLA slice.

Quantization: symmetric per-output-channel int4 (scale = absmax/7),
values in [-7, 7]. This is the MXU/VPU-friendly counterpart of the
reference's bitsandbytes 4-bit serving surface (train_halva.py:
1036-1052); the NF4 code-value variant lives in ops/quant.py (XLA
path, used for QLoRA training where the dequant copy amortizes over a
2048-token forward).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_N = 512


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def quantize_kernel_int4_stacked(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(L, K, N) float -> {kernel_q4 (L, K, N) int4,
    kernel_scale4i (L, 1, N) f32-as-bf16 per-output-channel scales}."""
    w32 = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)  # (L, 1, N)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(w32 / scale), -7, 7).astype(jnp.int4)
    return {
        "kernel_q4i": q,
        "kernel_scale4i": scale.astype(jnp.bfloat16),
    }


def _w4_kernel(
    li_ref,  # (1,) int32 scalar prefetch
    x_ref,  # (B, K) bf16
    w_ref,  # (1, K, bn) int4
    s_ref,  # (1, 1, bn) bf16
    o_ref,  # (B, bn)
):
    x = x_ref[...]
    w = w_ref[0].astype(x.dtype)  # int4 -> bf16 in-register
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[0, 0].astype(jnp.float32)[None, :]).astype(
        o_ref.dtype
    )
    del li_ref


def w4_dense_stacked(
    x: jnp.ndarray,  # (B, K) bf16
    stacked: Dict[str, jnp.ndarray],  # kernel_q4i (L,K,N), scale (L,1,N)
    layer: jnp.ndarray,  # () int32
    block_n: int = DEFAULT_BLOCK_N,
) -> jnp.ndarray:
    """y = x @ dequant(W4[layer]) — one GEMV-class matmul streaming int4
    blocks of the stacked weights (no per-layer slice materialization)."""
    w = stacked["kernel_q4i"]
    L, k, n = w.shape
    b = x.shape[0]
    bn = min(block_n, n)
    assert n % bn == 0, (n, bn)
    nb = n // bn

    out = pl.pallas_call(
        _w4_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((b, k), lambda ni, li: (0, 0)),
                pl.BlockSpec((1, k, bn), lambda ni, li: (li[0], 0, ni)),
                pl.BlockSpec((1, 1, bn), lambda ni, li: (li[0], 0, ni)),
            ],
            out_specs=pl.BlockSpec((b, bn), lambda ni, li: (0, ni)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
        interpret=_interp(),
    )(
        jnp.reshape(layer.astype(jnp.int32), (1,)),
        x,
        w,
        stacked["kernel_scale4i"],
    )
    return out
