"""Llama-family decoder LLM, TPU-native functional implementation.

Design (idiomatic JAX, not a port of the reference's vendored HF Llama at
llava/model/language_model/modelling_llama.py):

- Parameters are a plain pytree; per-layer weights are *stacked* along a
  leading `num_layers` axis and the forward pass is a single `lax.scan` over
  layers. One layer is traced/compiled once regardless of depth, and
  `jax.checkpoint` on the scan body gives layer-granular rematerialization
  (the reference's gradient_checkpointing).
- All matmuls go through `dense()`, which understands optional fused LoRA
  factors (lora_a/lora_b) — LoRA is a param-tree feature, not a model wrapper
  (replaces PEFT; see halva_tpu/train/lora.py).
- Attention uses segment ids (padding + packing) via halva_tpu.ops.attention,
  replacing the reference's flash-attn monkey patch
  (llava/train/llama_flash_attn_monkey_patch.py).
- RoPE follows the HF half-split convention so converted HF checkpoints are
  bit-compatible; optional linear position scaling reproduces VILA's
  context-length extension (vila/model/language_model/builder.py:43-51).

Shapes: B batch, S sequence, D hidden, H heads, Dh head dim, V vocab.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from halva_tpu.config import LlamaConfig
from halva_tpu.ops.attention import attention

Params = Dict[str, Any]


def _mlp_act(cfg: "LlamaConfig"):
    if cfg.mlp_act == "silu":
        return jax.nn.silu
    if cfg.mlp_act == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown mlp_act {cfg.mlp_act!r}")


# --------------------------------------------------------------------------
# Primitive layers
# --------------------------------------------------------------------------


def dense(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """y = x @ kernel [+ bias] [+ lora_scale * (x @ lora_a) @ lora_b].

    Kernels may be weight-only int8 (kernel_q + kernel_scale, see
    halva_tpu.ops.quant) — dequantized on the fly, one layer at a time.
    """
    if "kernel_q" in p:
        w = (
            p["kernel_q"].astype(x.dtype)
            * p["kernel_scale"].astype(x.dtype)
        )
        y = jnp.dot(x, w)
    else:
        y = jnp.dot(x, p["kernel"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    if "lora_a" in p:
        lo = jnp.dot(
            jnp.dot(x, p["lora_a"].astype(x.dtype)),
            p["lora_b"].astype(x.dtype),
        )
        y = y + p["lora_scale"].astype(x.dtype) * lo
    return y


def rms_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    eps: float,
    unit_offset: bool = False,
) -> jnp.ndarray:
    """RMSNorm in fp32, result cast back to input dtype (HF parity).
    unit_offset: Gemma convention, effective scale = 1 + w."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    w = scale.astype(jnp.float32)
    if unit_offset:
        w = 1.0 + w
    return (x * w).astype(dtype)


def rope_cos_sin(
    positions: jnp.ndarray,  # (B, S) int32
    head_dim: int,
    theta: float,
    linear_scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables (B, S, Dh/2) in fp32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    pos = positions.astype(jnp.float32)
    if linear_scale is not None:
        pos = pos / linear_scale
    angles = pos[..., None] * inv_freq[None, None, :]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jnp.ndarray,  # (B, S, H, Dh)
    cos: jnp.ndarray,  # (B, S, Dh/2)
    sin: jnp.ndarray,
) -> jnp.ndarray:
    """HF half-split rotation: out = x*cos + rotate_half(x)*sin."""
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


# --------------------------------------------------------------------------
# Initialization
# --------------------------------------------------------------------------


def _init_dense(key, in_dim, out_dim, dtype) -> Params:
    std = in_dim**-0.5
    return {
        "kernel": jax.random.normal(key, (in_dim, out_dim), dtype) * std
    }


def init_params(
    key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32
) -> Params:
    """Random init. Per-layer tensors are stacked on axis 0 (num_layers)."""
    d, dh = cfg.hidden_size, cfg.head_size
    h, kvh = cfg.num_heads, cfg.kv_heads
    keys = jax.random.split(key, 10)

    def stack_layer(init_fn, k):
        ks = jax.random.split(k, cfg.num_layers)
        return jax.vmap(init_fn)(ks)

    layers = {
        "attn": {
            "wq": stack_layer(
                lambda k: _init_dense(k, d, h * dh, dtype), keys[0]
            ),
            "wk": stack_layer(
                lambda k: _init_dense(k, d, kvh * dh, dtype), keys[1]
            ),
            "wv": stack_layer(
                lambda k: _init_dense(k, d, kvh * dh, dtype), keys[2]
            ),
            "wo": stack_layer(
                lambda k: _init_dense(k, h * dh, d, dtype), keys[3]
            ),
        },
        "mlp": {
            "gate": stack_layer(
                lambda k: _init_dense(k, d, cfg.intermediate_size, dtype),
                keys[4],
            ),
            "up": stack_layer(
                lambda k: _init_dense(k, d, cfg.intermediate_size, dtype),
                keys[5],
            ),
            "down": stack_layer(
                lambda k: _init_dense(k, cfg.intermediate_size, d, dtype),
                keys[6],
            ),
        },
        "input_norm": {
            "scale": jnp.ones((cfg.num_layers, d), dtype)
        },
        "post_attn_norm": {
            "scale": jnp.ones((cfg.num_layers, d), dtype)
        },
    }
    params: Params = {
        "embed": {
            "embedding": jax.random.normal(
                keys[7], (cfg.vocab_size, d), dtype
            )
            * 0.02
        },
        "layers": layers,
        "final_norm": {"scale": jnp.ones((d,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _init_dense(keys[8], d, cfg.vocab_size, dtype)
    return params


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def embed(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Token embedding lookup. Out-of-range ids (e.g. the -200 image
    sentinel or -100 ignore) are clamped to 0 — callers overwrite those
    positions in the splice."""
    p = params["embed"]
    table = p.get("embedding", p.get("embedding_q"))
    ids = jnp.clip(input_ids, 0, table.shape[0] - 1)
    if "embedding_q" in p:
        from halva_tpu.ops.quant import embed_lookup

        return embed_lookup(p, ids)
    return jnp.take(p["embedding"], ids, axis=0)


def _layer(
    cfg: LlamaConfig,
    attn_impl: str,
    x: jnp.ndarray,  # (B, S, D)
    layer_params: Params,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    segment_ids: jnp.ndarray,  # (B, S)
    positions: Optional[jnp.ndarray] = None,  # needed for alibi/window
) -> jnp.ndarray:
    b, s, d = x.shape
    h, kvh, dh = cfg.num_heads, cfg.kv_heads, cfg.head_size
    ap, mp = layer_params["attn"], layer_params["mlp"]

    y = rms_norm(x, layer_params["input_norm"]["scale"], cfg.rms_norm_eps, cfg.rmsnorm_unit_offset)
    q = dense(y, ap["wq"]).reshape(b, s, h, dh)
    k = dense(y, ap["wk"]).reshape(b, s, kvh, dh)
    v = dense(y, ap["wv"]).reshape(b, s, kvh, dh)
    if cfg.position_embedding == "rope":
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    if cfg.sliding_window is not None or cfg.position_embedding == "alibi":
        # alt-backend path (Mistral local attention / MPT ALiBi): XLA
        # masked attention with optional additive bias
        from halva_tpu.ops.attention import (
            alibi_bias,
            attention_reference,
            make_attention_mask,
        )

        mask = make_attention_mask(
            segment_ids,
            segment_ids,
            causal=True,
            sliding_window=cfg.sliding_window,
        )
        bias = None
        if cfg.position_embedding == "alibi":
            assert positions is not None
            bias = alibi_bias(h, positions, positions)
        attn_out = attention_reference(q, k, v, mask=mask, bias=bias)
    else:
        attn_out = attention(
            q, k, v, segment_ids, segment_ids, causal=True, impl=attn_impl
        )
    x = x + dense(attn_out.reshape(b, s, h * dh), ap["wo"])

    y = rms_norm(
        x, layer_params["post_attn_norm"]["scale"], cfg.rms_norm_eps,
        cfg.rmsnorm_unit_offset,
    )
    gated = _mlp_act(cfg)(dense(y, mp["gate"])) * dense(y, mp["up"])
    x = x + dense(gated, mp["down"])
    return x


def forward_embeds(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    segment_ids: jnp.ndarray,  # (B, S) int32; 0 = padding
    positions: jnp.ndarray,  # (B, S) int32
    attn_impl: str = "auto",
    remat: bool = False,
) -> jnp.ndarray:
    """Run the decoder stack over precomputed input embeddings.

    Returns final hidden states (B, S, D) after the final RMSNorm.
    """
    cos, sin = rope_cos_sin(
        positions, cfg.head_size, cfg.rope_theta, cfg.rope_scaling
    )

    body = functools.partial(_layer, cfg, attn_impl)
    if remat:
        body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.nothing_saveable
        )

    def scan_fn(x, layer_params):
        return body(x, layer_params, cos, sin, segment_ids, positions), None

    x, _ = jax.lax.scan(scan_fn, inputs_embeds, params["layers"])
    return rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps, cfg.rmsnorm_unit_offset)


def lm_logits(
    params: Params, cfg: LlamaConfig, hidden: jnp.ndarray
) -> jnp.ndarray:
    """fp32 logits (the reference always casts logits to fp32 for the loss,
    llava/train/halva_trainer.py:473)."""
    if cfg.tie_word_embeddings:
        ep = params["embed"]
        if "embedding_q" in ep:
            w = ep["embedding_q"].astype(jnp.float32) * ep[
                "embedding_scale"
            ].astype(jnp.float32)
        else:
            w = ep["embedding"]
        out = jnp.dot(hidden, w.T.astype(hidden.dtype))
    else:
        out = dense(hidden, params["lm_head"])
    return out.astype(jnp.float32)


def forward(
    params: Params,
    cfg: LlamaConfig,
    input_ids: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    remat: bool = False,
) -> jnp.ndarray:
    """Token-id convenience entry: returns fp32 logits (B, S, V)."""
    b, s = input_ids.shape
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    x = embed(params, input_ids)
    if cfg.embed_scale:  # Gemma: normalize embeddings by sqrt(hidden)
        x = x * jnp.asarray(cfg.hidden_size**0.5, x.dtype)
    h = forward_embeds(
        params, cfg, x, segment_ids, positions, attn_impl, remat
    )
    return lm_logits(params, cfg, h)


# --------------------------------------------------------------------------
# KV-cache decode
# --------------------------------------------------------------------------


def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> Params:
    shape = (cfg.num_layers, batch, max_len, cfg.kv_heads, cfg.head_size)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
    }


def prefill(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    segment_ids: jnp.ndarray,  # (B, S)
    positions: jnp.ndarray,  # (B, S)
    cache: Params,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, Params]:
    """Full-sequence forward that also fills the KV cache at [0, S).

    Returns (final hidden states, updated cache). Prompts are right-padded;
    padding keys carry segment id 0 so decode steps never attend to them.
    """
    b, s, d = inputs_embeds.shape
    h_, kvh, dh = cfg.num_heads, cfg.kv_heads, cfg.head_size
    cos, sin = rope_cos_sin(
        positions, cfg.head_size, cfg.rope_theta, cfg.rope_scaling
    )

    # the full stacked cache rides the scan CARRY so XLA updates it in
    # place (one HBM buffer) instead of materializing input+output copies
    def scan_fn(carry, inputs):
        x, k_full, v_full, li = carry
        layer_params = inputs
        ap, mp = layer_params["attn"], layer_params["mlp"]
        y = rms_norm(x, layer_params["input_norm"]["scale"], cfg.rms_norm_eps, cfg.rmsnorm_unit_offset)
        q = dense(y, ap["wq"]).reshape(b, s, h_, dh)
        k = dense(y, ap["wk"]).reshape(b, s, kvh, dh)
        v = dense(y, ap["wv"]).reshape(b, s, kvh, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        k_full = jax.lax.dynamic_update_slice(
            k_full, k.astype(k_full.dtype)[None], (li, 0, 0, 0, 0)
        )
        v_full = jax.lax.dynamic_update_slice(
            v_full, v.astype(v_full.dtype)[None], (li, 0, 0, 0, 0)
        )
        attn_out = attention(
            q, k, v, segment_ids, segment_ids, causal=True, impl=attn_impl
        )
        x = x + dense(attn_out.reshape(b, s, h_ * dh), ap["wo"])
        y = rms_norm(
            x, layer_params["post_attn_norm"]["scale"], cfg.rms_norm_eps,
            cfg.rmsnorm_unit_offset,
        )
        gated = _mlp_act(cfg)(dense(y, mp["gate"])) * dense(y, mp["up"])
        x = x + dense(gated, mp["down"])
        return (x, k_full, v_full, li + 1), None

    (x, new_k, new_v, _), _ = jax.lax.scan(
        scan_fn,
        (inputs_embeds, cache["k"], cache["v"], jnp.int32(0)),
        params["layers"],
    )
    hidden = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps, cfg.rmsnorm_unit_offset)
    return hidden, {"k": new_k, "v": new_v}


def decode_step(
    params: Params,
    cfg: LlamaConfig,
    token_embeds: jnp.ndarray,  # (B, 1, D)
    positions: jnp.ndarray,  # (B,) absolute position of this token
    cache: Params,
    cache_segment_ids: jnp.ndarray,  # (B, Smax) 0 = invalid slot
    attn_impl: str = "xla",
) -> Tuple[jnp.ndarray, Params]:
    """One decode step: returns (fp32 logits (B, V), updated cache).

    The new token is written at `positions` per row; cache_segment_ids must
    already mark that slot valid. Decode attention is the XLA path — a
    single-query gather/matvec is bandwidth-bound and XLA handles it well.
    """
    b = token_embeds.shape[0]
    h_, kvh, dh = cfg.num_heads, cfg.kv_heads, cfg.head_size
    cos, sin = rope_cos_sin(
        positions[:, None], cfg.head_size, cfg.rope_theta, cfg.rope_scaling
    )

    def scan_fn(carry, layer_params):
        x, k_full, v_full, li = carry
        ap, mp = layer_params["attn"], layer_params["mlp"]
        y = rms_norm(x, layer_params["input_norm"]["scale"], cfg.rms_norm_eps, cfg.rmsnorm_unit_offset)
        q = dense(y, ap["wq"]).reshape(b, 1, h_, dh)
        k = dense(y, ap["wk"]).reshape(b, 1, kvh, dh)
        v = dense(y, ap["wv"]).reshape(b, 1, kvh, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        # scatter new k/v at per-row positions into the carried cache —
        # carry aliasing keeps a single HBM buffer
        k_cache = jax.lax.dynamic_index_in_dim(k_full, li, 0, False)
        v_cache = jax.lax.dynamic_index_in_dim(v_full, li, 0, False)
        slot = jnp.arange(k_cache.shape[1], dtype=jnp.int32)[None, :]
        is_slot = (slot == positions[:, None])[:, :, None, None]
        new_k = jnp.where(is_slot, k.astype(k_cache.dtype), k_cache)
        new_v = jnp.where(is_slot, v.astype(v_cache.dtype), v_cache)
        k_full = jax.lax.dynamic_update_slice(
            k_full, new_k[None], (li, 0, 0, 0, 0)
        )
        v_full = jax.lax.dynamic_update_slice(
            v_full, new_v[None], (li, 0, 0, 0, 0)
        )

        q_seg = jnp.ones((b, 1), jnp.int32)
        attn_out = attention(
            q,
            new_k.astype(q.dtype),
            new_v.astype(q.dtype),
            q_seg,
            cache_segment_ids,
            causal=False,  # validity handled via cache_segment_ids
            impl=attn_impl,
        )
        x = x + dense(attn_out.reshape(b, 1, h_ * dh), ap["wo"])
        y = rms_norm(
            x, layer_params["post_attn_norm"]["scale"], cfg.rms_norm_eps,
            cfg.rmsnorm_unit_offset,
        )
        gated = _mlp_act(cfg)(dense(y, mp["gate"])) * dense(y, mp["up"])
        x = x + dense(gated, mp["down"])
        return (x, k_full, v_full, li + 1), None

    (x, new_k, new_v, _), _ = jax.lax.scan(
        scan_fn,
        (token_embeds, cache["k"], cache["v"], jnp.int32(0)),
        params["layers"],
    )
    hidden = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps, cfg.rmsnorm_unit_offset)
    logits = lm_logits(params, cfg, hidden)[:, 0]
    return logits, {"k": new_k, "v": new_v}
