"""Weight-only int8 quantization for serving.

TPU-native replacement for the capability the reference gets from
bitsandbytes (4/8-bit QLoRA path, llava/train/train_halva.py:1036-1052):
per-output-channel symmetric absmax int8 on every dense kernel (and
per-row on the embedding table). Halves weight HBM traffic (the decode
bottleneck) and fits llava-7b + large decode batches on one 16GB v5e chip.

Runtime dequantization happens inside halva_tpu.models.llama.dense: one
layer's weights are expanded at a time (scan), so peak memory is
int8 params + a single layer in bf16.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_kernel(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(..., in, out) -> int8 kernel + (..., 1, out) bf16 scales."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"kernel_q": q, "kernel_scale": scale.astype(jnp.bfloat16)}


def quantize_embedding(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(V, D) -> int8 rows + (V, 1) scales."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"embedding_q": q, "embedding_scale": scale.astype(jnp.bfloat16)}


# bitsandbytes NF4 code values (QLoRA paper table; the behavioral
# contract behind the reference's load_in_4bit/quant_type="nf4" path,
# llava/train/train_halva.py:1036-1052)
NF4_CODE = (
    -1.0, -0.6961928009986877, -0.5250730514526367,
    -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
    -0.09105003625154495, 0.0, 0.07958029955625534,
    0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
    0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0,
)


def quantize_kernel_nf4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(..., in, out) -> 4-bit NF4 code indices (uint4) + per-output-
    channel absmax scales. Nearest-code rounding; dequant =
    NF4_CODE[idx] * scale."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax)
    normed = w32 / scale
    code = jnp.asarray(NF4_CODE, jnp.float32)
    idx = jnp.argmin(
        jnp.abs(normed[..., None] - code), axis=-1
    ).astype(jnp.uint4)
    return {"kernel_q4": idx, "kernel_scale4": scale.astype(jnp.bfloat16)}


@jax.custom_vjp
def nf4_dense(x: jnp.ndarray, kernel_q4: jnp.ndarray,
              kernel_scale4: jnp.ndarray) -> jnp.ndarray:
    """4-bit NF4 weight-only matmul (QLoRA-class serving/training base).
    Pinned backward orientation like w8_dense."""
    w = _nf4_dequant(kernel_q4, kernel_scale4, x.dtype)
    return jnp.dot(x, w)


def _nf4_dequant(idx, scale, dtype):
    code = jnp.asarray(NF4_CODE, dtype)
    return jnp.take(code, idx.astype(jnp.int32), axis=0) * scale.astype(
        dtype
    )


def _nf4_dense_fwd(x, kernel_q4, kernel_scale4):
    return nf4_dense(x, kernel_q4, kernel_scale4), (
        kernel_q4, kernel_scale4,
    )


def _nf4_dense_bwd(res, g):
    kernel_q4, kernel_scale4 = res
    w = _nf4_dequant(kernel_q4, kernel_scale4, g.dtype)
    dx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ()))
    )
    return dx, None, None


nf4_dense.defvjp(_nf4_dense_fwd, _nf4_dense_bwd)


def quantize_params(
    params: Params, quantize_embed: bool = True, bits: int = 8
) -> Params:
    """Rewrite every dense kernel (and optionally the embed table) into
    int8 (bits=8) or NF4 (bits=4) form. LoRA factors stay in their
    original dtype (they are tiny and train in bf16/fp32). The embed
    table stays int8 even at bits=4 (NF4 gather quality on the embedding
    is poor and the table is small next to the mlps)."""
    assert bits in (4, 8), bits
    qk = quantize_kernel_nf4 if bits == 4 else quantize_kernel

    def rewrite(node):
        if not isinstance(node, dict):
            if isinstance(node, (list, tuple)):
                return type(node)(rewrite(x) for x in node)
            return node
        if "kernel" in node and node["kernel"].ndim in (2, 3):
            out = {k: v for k, v in node.items() if k != "kernel"}
            out.update(qk(node["kernel"]))
            return out
        if (
            "embedding" in node
            and quantize_embed
            and node["embedding"].ndim == 2
            and node["embedding"].shape[0] >= 4096  # vocab tables only
        ):
            out = {k: v for k, v in node.items() if k != "embedding"}
            out.update(quantize_embedding(node["embedding"]))
            return out
        return {k: rewrite(v) for k, v in node.items()}

    return rewrite(params)


def quantize_params_inplace(
    params: Params, quantize_embed: bool = True
) -> Params:
    """Like quantize_params, but frees each source array right after its
    int8 replacement is computed — peak device memory stays at
    original-params + one tensor instead of original + quantized."""

    def rewrite(node):
        if not isinstance(node, dict):
            if isinstance(node, (list, tuple)):
                return type(node)(rewrite(x) for x in node)
            return node
        if "kernel" in node and node["kernel"].ndim in (2, 3):
            out = {k: v for k, v in node.items() if k != "kernel"}
            q = quantize_kernel(node["kernel"])
            jax.block_until_ready(q)
            src = node["kernel"]
            node["kernel"] = None
            if hasattr(src, "delete"):
                src.delete()
            out.update(q)
            return out
        if (
            "embedding" in node
            and quantize_embed
            and node["embedding"].ndim == 2
            and node["embedding"].shape[0] >= 4096
        ):
            out = {k: v for k, v in node.items() if k != "embedding"}
            q = quantize_embedding(node["embedding"])
            jax.block_until_ready(q)
            src = node["embedding"]
            node["embedding"] = None
            if hasattr(src, "delete"):
                src.delete()
            out.update(q)
            return out
        return {k: rewrite(v) for k, v in node.items()}

    return rewrite(params)


def quantize_params_host(params: Params, quantize_embed: bool = True) -> Params:
    """Numpy (host-RAM) quantization — use when device memory cannot hold
    both trees. NOTE: on the axon relay platform, Array.delete() does not
    actually free device HBM, so the in-place device variant cannot
    reclaim the bf16 originals; quantize on host and device_put the int8
    tree instead."""
    import numpy as np

    def qk(w):
        w32 = np.asarray(w, np.float32)
        absmax = np.max(np.abs(w32), axis=-2, keepdims=True)
        scale = np.where(absmax == 0, 1.0, absmax / 127.0)
        q = np.clip(np.round(w32 / scale), -127, 127).astype(np.int8)
        return {"kernel_q": q, "kernel_scale": scale.astype(jnp.bfloat16)}

    def qe(w):
        w32 = np.asarray(w, np.float32)
        absmax = np.max(np.abs(w32), axis=-1, keepdims=True)
        scale = np.where(absmax == 0, 1.0, absmax / 127.0)
        q = np.clip(np.round(w32 / scale), -127, 127).astype(np.int8)
        return {
            "embedding_q": q,
            "embedding_scale": scale.astype(jnp.bfloat16),
        }

    def rewrite(node):
        if not isinstance(node, dict):
            if isinstance(node, (list, tuple)):
                return type(node)(rewrite(x) for x in node)
            return node
        if "kernel" in node and node["kernel"].ndim in (2, 3):
            out = {k: v for k, v in node.items() if k != "kernel"}
            out.update(qk(node["kernel"]))
            return out
        if (
            "embedding" in node
            and quantize_embed
            and node["embedding"].ndim == 2
            and node["embedding"].shape[0] >= 4096
        ):
            out = {k: v for k, v in node.items() if k != "embedding"}
            out.update(qe(node["embedding"]))
            return out
        return {k: rewrite(v) for k, v in node.items()}

    return rewrite(params)


@jax.custom_vjp
def int8_dense(x: jnp.ndarray, kernel_q: jnp.ndarray,
               kernel_scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8: dynamic per-token int8 activations x per-channel int8 weights
    on the MXU (s8xs8->s32 is a native TPU MXU mode at 2x bf16 peak).

    Replaces the weight-dequant path for serving: weight-only int8 decode
    is VPU-bound on the int8->bf16 weight converts (O(in*out) VPU work per
    matmul, measured ~370 tok/s ceiling for llava-7b batch 16); quantizing
    the activation instead costs O(rows*in) VPU work and keeps the weight
    in int8 all the way into the MXU. Out-of-MXU rescale is
    rows x out elementwise: y = s32_acc * (sx_row * sw_col).

    Gradient: straight-through — dx = g @ W_deq.T (round() has zero
    derivative a.e., which would silently kill the backward through the
    base matmul in QLoRA-class training over an int8 base).
    """
    return _int8_dense_impl(x, kernel_q, kernel_scale)


def _int8_dense_impl(x, kernel_q, kernel_scale):
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        kernel_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * kernel_scale.astype(jnp.float32)
    return y.astype(x.dtype)


def _int8_dense_fwd(x, kernel_q, kernel_scale):
    return _int8_dense_impl(x, kernel_q, kernel_scale), (
        kernel_q, kernel_scale,
    )


def _int8_dense_bwd(res, g):
    kernel_q, kernel_scale = res
    # g.dtype == x.dtype (the primal output is cast to x.dtype)
    w = kernel_q.astype(g.dtype) * kernel_scale.astype(g.dtype)
    dx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ()))
    )
    return dx, None, None


int8_dense.defvjp(_int8_dense_fwd, _int8_dense_bwd)


@jax.custom_vjp
def w8_dense(x: jnp.ndarray, kernel_q: jnp.ndarray,
             kernel_scale: jnp.ndarray) -> jnp.ndarray:
    """Weight-dequant int8 matmul with a PINNED backward orientation.

    Mathematically identical to `x @ (kernel_q * kernel_scale)`, but the
    custom vjp computes dx by contracting the OUTPUT dim of the raw int8
    kernel (dot_general ((g.last), (w.dim1))) instead of differentiating
    through the dequant matmul. Without this, XLA hoists TRANSPOSED int8
    copies of every stacked weight out of the layer scan for the
    backward dots — +5.8 GB of loop-invariant temps at 7B (measured:
    s8[32,4096,4096]{1,2,0} x3 etc. in the OOM breakdown, 2026-08-16),
    which is the difference between fitting and not fitting the QLoRA
    recipe on a 16 GB chip.
    """
    w = kernel_q.astype(x.dtype) * kernel_scale.astype(x.dtype)
    return jnp.dot(x, w)


def _w8_dense_fwd(x, kernel_q, kernel_scale):
    return w8_dense(x, kernel_q, kernel_scale), (kernel_q, kernel_scale)


def _w8_dense_bwd(res, g):
    kernel_q, kernel_scale = res
    w = kernel_q.astype(g.dtype) * kernel_scale.astype(g.dtype)
    dx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ()))
    )
    return dx, None, None


w8_dense.defvjp(_w8_dense_fwd, _w8_dense_bwd)


_W8A8 = None  # tri-state: None = read env once, else bool


def w8a8_enabled() -> bool:
    """Whether int8 kernels run as W8A8 (int8 activations on the MXU)
    instead of weight-dequant-to-bf16. Default ON for serving (can be
    disabled with HALVA_W8A8=0); trace-time constant, so set it before
    the first jit compile."""
    global _W8A8
    if _W8A8 is None:
        import os

        _W8A8 = os.environ.get("HALVA_W8A8", "1") != "0"
    return _W8A8


def set_w8a8(enabled: bool) -> None:
    global _W8A8
    _W8A8 = bool(enabled)


_W4A8 = None  # tri-state: None = read env once, else bool


def w4a8_enabled() -> bool:
    """Whether int4 prefill runs as W4A8 (unpack to int8 + s8xs8 MXU
    dot, ops/w4_matmul.w4a8_dense) instead of dequant-to-bf16.
    HALVA_W4A8, default off until chip-validated; trace-time constant."""
    global _W4A8
    if _W4A8 is None:
        import os

        _W4A8 = os.environ.get("HALVA_W4A8", "0") == "1"
    return _W4A8


def set_w4a8(enabled: bool) -> None:
    global _W4A8
    _W4A8 = bool(enabled)


def dequantize_kernel(p: Params, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (
        p["kernel_q"].astype(jnp.float32)
        * p["kernel_scale"].astype(jnp.float32)
    ).astype(dtype)


def embed_lookup(p: Params, ids: jnp.ndarray, dtype=jnp.bfloat16):
    """Quantization-aware embedding lookup."""
    if "embedding_q" in p:
        rows = jnp.take(p["embedding_q"], ids, axis=0).astype(jnp.float32)
        scale = jnp.take(p["embedding_scale"], ids, axis=0).astype(
            jnp.float32
        )
        return (rows * scale).astype(dtype)
    return jnp.take(p["embedding"], ids, axis=0)
