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
    if cfg.mlp_act == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown mlp_act {cfg.mlp_act!r}")



# --------------------------------------------------------------------------
# Primitive layers
# --------------------------------------------------------------------------


def dense(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """y = x @ kernel [+ bias] [+ lora_scale * (x @ lora_a) @ lora_b].

    Kernels may be weight-only int8 (kernel_q + kernel_scale) or 4-bit
    NF4 (kernel_q4 + kernel_scale4) — see halva_tpu.ops.quant;
    dequantized on the fly, one layer at a time.
    """
    if "kernel_q4p" in p:
        # packed symmetric int4 (serving W4 path, ops/w4_matmul.py).
        # This XLA branch serves prefill/full-forward; the decode scan
        # dispatches to the stacked Pallas kernel instead.
        from halva_tpu.ops import quant
        from halva_tpu.ops.w4_matmul import unpack_int4, w4a8_dense

        ng = p["kernel_scale4p"].shape[1]  # scale groups along K (1 = per-channel)
        if quant.w4a8_enabled() and ng == 1:
            # per-channel W4A8: unpack to int8 + s8xs8 MXU dot with
            # dynamic per-token int8 activations — ~350 TF/s effective
            # at the b80 prefill M (~50k rows); grouped-K scales cannot
            # fold past the int32 dot
            y = w4a8_dense(x, p["kernel_q4p"], p["kernel_scale4p"])
        else:
            # materialized bf16 dequant: the copy amortizes over the
            # whole sequence (measured ~226 TF/s effective at b80
            # prefill M). NOTE measured negative result: routing this
            # through the Pallas in-VMEM-dequant GEMM (w4_gemm) wins
            # the M=4096 microbench (79.3 vs 72.5 TF/s) but LOSES at
            # serving prefill M (~128 TF/s, b80 bench 8.91 -> 12.18 s
            # step) — XLA's dequant copy amortizes with M, the
            # kernel's W re-streaming per M-block does not. w4_gemm
            # stays available for small-M callers.
            lo, hi = unpack_int4(p["kernel_q4p"])
            s = p["kernel_scale4p"].astype(x.dtype)  # (2, G, N/2)
            if ng > 1:
                s = jnp.repeat(s, lo.shape[0] // ng, axis=1)  # (2, K, N/2)
            w = jnp.concatenate(
                [lo.astype(x.dtype) * s[0], hi.astype(x.dtype) * s[1]],
                axis=-1,
            )
            y = jnp.dot(x, w)
    elif "kernel_q4" in p:
        from halva_tpu.ops import quant

        y = quant.nf4_dense(x, p["kernel_q4"], p["kernel_scale4"])
    elif "kernel_q" in p:
        from halva_tpu.ops import quant

        if quant.w8a8_enabled():
            # W8A8: int8 activations x int8 weights on the MXU — no
            # O(in*out) weight convert at all (see quant.int8_dense).
            y = quant.int8_dense(x, p["kernel_q"], p["kernel_scale"])
        else:
            # weight-dequant path with pinned backward orientation (see
            # quant.w8_dense). XLA's dequant-then-dot measured FASTER
            # than a fused Pallas int8 kernel for llava-7b decode (369
            # vs 260 tok/s at batch 16): the convert fuses into the
            # dot's operand pipeline (ops/int8_matmul.py remains
            # available).
            y = quant.w8_dense(x, p["kernel_q"], p["kernel_scale"])
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


def layer_norm_np(
    x: jnp.ndarray, scale: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """Bias-free LayerNorm (MPT norm convention)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    return out.astype(dtype)


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


def _norm(cfg: LlamaConfig, x: jnp.ndarray, scale: jnp.ndarray):
    if cfg.norm_type == "layernorm":
        return layer_norm_np(x, scale, cfg.rms_norm_eps)
    return rms_norm(x, scale, cfg.rms_norm_eps, cfg.rmsnorm_unit_offset)


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

    y = _norm(cfg, x, layer_params["input_norm"]["scale"])
    q = dense(y, ap["wq"]).reshape(b, s, h, dh)
    k = dense(y, ap["wk"]).reshape(b, s, kvh, dh)
    v = dense(y, ap["wv"]).reshape(b, s, kvh, dh)
    if cfg.position_embedding == "rope":
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    # Mistral sliding-window / MPT ALiBi run IN-KERNEL on the flash path
    # (ops/attention.py dispatch; XLA fallback materializes mask+bias)
    attn_out = attention(
        q,
        k,
        v,
        segment_ids,
        segment_ids,
        causal=True,
        impl=attn_impl,
        alibi=cfg.position_embedding == "alibi",
        sliding_window=cfg.sliding_window,
    )
    x = x + dense(attn_out.reshape(b, s, h * dh), ap["wo"])

    y = _norm(cfg, x, layer_params["post_attn_norm"]["scale"])
    if cfg.gated_mlp:
        gated = _mlp_act(cfg)(dense(y, mp["gate"])) * dense(y, mp["up"])
        x = x + dense(gated, mp["down"])
    else:
        x = x + dense(_mlp_act(cfg)(dense(y, mp["up"])), mp["down"])
    return x


def forward_embeds(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    segment_ids: jnp.ndarray,  # (B, S) int32; 0 = padding
    positions: jnp.ndarray,  # (B, S) int32
    attn_impl: str = "auto",
    remat: bool = False,
    constrain=None,
) -> jnp.ndarray:
    """Run the decoder stack over precomputed input embeddings.

    Returns final hidden states (B, S, D) after the final RMSNorm.

    constrain: optional fn applied to the scan carry each layer — under
    a multi-chip mesh the trainer passes a batch-over-"data" sharding
    constraint here. Without it XLA's SPMD propagation replicates the
    layer activations and all-reduces f32[B_global, S, mlp] tensors
    every layer (measured 600+ GB/step at 7B via scripts/comm_model.py)
    instead of all-gathering the FSDP weight shards.
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
        if constrain is not None:
            x = constrain(x)
        return body(x, layer_params, cos, sin, segment_ids, positions), None

    if constrain is not None:
        inputs_embeds = constrain(inputs_embeds)
    x, _ = jax.lax.scan(scan_fn, inputs_embeds, params["layers"])
    if constrain is not None:
        x = constrain(x)
    return _norm(cfg, x, params["final_norm"]["scale"])


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
#
# Cache layout: a read-only PROMPT cache (exact prompt length, produced as
# prefill scan outputs) + a small GENERATED cache (max_new_tokens slots,
# scan-carry updated in place). Splitting avoids ever allocating a
# max_len-sized buffer twice — on a 16GB chip with 13.4GB of llava-7b
# weights that head-room decides the decode batch size.
# --------------------------------------------------------------------------


def init_gen_cache(
    cfg: LlamaConfig,
    batch: int,
    max_new: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
    tp: int = 1,
) -> Params:
    """Head-major (L, B, KVH, Sg, Dh), matching the prompt cache (see
    prefill) so the fused decode kernel consumes both uniformly.
    quantized: int8 values + per-(head, slot) scales — halves gen-cache
    decode traffic (3.8 GB/step at llava-7b b56 Sg=128 bf16).

    Sg is max_new rounded UP to a 128-multiple: the fused decode kernel
    reads the gen cache as one block with Sg as the sublane dim AND
    builds (H, Sg) logit tiles with Sg as the LANE dim — Mosaic rejects
    minor-dim insertion on bf16 vectors whose lane dim is not a
    128-multiple (measured on-chip: sg=32 fails `tpu.reshape
    (8x32) -> (8x1x32)`; sg=128 compiles). Unaligned max_new would only
    surface on real TPU (CPU tests run in interpret mode). Padded slots
    stay gen_valid=False (decode_step masks slots > step)."""
    max_new = -(-max_new // 128) * 128
    shape = (
        cfg.num_layers,
        batch,
        cfg.kv_heads // tp,  # local heads under manual TP (see prefill)
        max_new,
        cfg.head_size,
    )
    if quantized:
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.ones(sshape, jnp.bfloat16),
            "v_scale": jnp.ones(sshape, jnp.bfloat16),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _quantize_kv(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., Dh) -> int8 values + per-leading-dims bf16 scales.

    Symmetric absmax over the head dim; scales fold into the (tiny)
    attention logits / probabilities at decode time (_decode_attend), so
    the int8 cache halves decode HBM traffic (measured KV-bandwidth-bound,
    STATUS r1 §2) without a full dequantized materialization."""
    t32 = t.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(t32), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(t32 / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.bfloat16)


def _quantize_kv4(
    t: jnp.ndarray,  # (B, KVH, S, Dh) head-major, S EVEN
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int4 prompt-KV: symmetric absmax/7 per (token, head), adjacent
    token PAIRS packed one-per-nibble along the sequence dim.

    Returns (packed (B, KVH, S/2, Dh) int8 [token 2r in the low nibble,
    2r+1 in the high nibble], scales (B, 2, KVH, S/2) bf16 with the
    even/odd plane as a LEADING dim). The even/odd split (rather than
    token-order scales) keeps every decode-kernel access lane-aligned:
    the kernel processes a 512-token block as two 256-column sub-blocks
    (even tokens, odd tokens) and selects the sub-plane by a leading-dim
    index, which Mosaic always supports (64-wide lane slices are not —
    see CLAUDE.md).

    Packing along SEQUENCE (not head_dim) keeps the contraction dims of
    both in-kernel dots untouched; halving Dh would force unaligned
    64-lane operations."""
    b, kvh, s, dh = t.shape
    assert s % 2 == 0, "int4 KV packing needs an even sequence length"
    t32 = t.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(t32), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(t32 / scale), -7, 7).astype(jnp.int32)
    even, odd = q[:, :, 0::2], q[:, :, 1::2]  # (B, KVH, S/2, Dh)
    packed = (odd << 4) | (even & 0xF)  # int32 in [0, 255]
    packed = jnp.where(packed > 127, packed - 256, packed).astype(jnp.int8)
    sc = scale[..., 0]  # (B, KVH, S)
    scales_eo = jnp.stack([sc[:, :, 0::2], sc[:, :, 1::2]], axis=1)
    return packed, scales_eo.astype(jnp.bfloat16)


def _unpack_kv4(packed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., S/2, Dh) int8 -> (lo, hi) int32 nibble values in [-8, 7]
    (lo = even tokens, hi = odd tokens). int32 shifts only — Mosaic will
    not legalize int8 vector shifts (same trick as ops/w4_matmul)."""
    x = packed.astype(jnp.int32)
    lo = (x << 28) >> 28
    hi = x >> 4
    return lo, hi




def prefill(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    segment_ids: jnp.ndarray,  # (B, S)
    positions: jnp.ndarray,  # (B, S)
    cache_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    quantize_cache: bool = False,
    tp: int = 1,
    tp_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, Params]:
    """Full-sequence forward producing the prompt KV cache.

    tp/tp_axis: MANUAL tensor parallelism inside jax.shard_map — the
    caller passes layer weights pre-split over mesh axis `tp_axis`
    (wq/wk/wv/gate/up by output column, wo/down by input row; see
    parallel/partition.eval_shmap_pspecs) and this body computes with
    the LOCAL `num_heads/tp` heads, psum-reducing the two row-split
    dots (wo, down) per layer. Unlike the sharding-propagation TP path,
    the Pallas attention kernels stay usable (each shard runs them on
    its local heads). Requires no bias on wo/down (a psum would
    multiply it) — guarded by partition.manual_tp_ready.

    Returns (final hidden states, prompt cache {k,v}: HEAD-MAJOR
    (L, B, KVH, S, Dh)). Head-major is the layout the fused decode
    kernel wants (ops/decode_attention.py): per-head sequence blocks
    are contiguous and batched dots need no in-kernel transpose
    (measured 3.2 ms -> ~0.2 ms per layer-call at b24). The layout is
    PRODUCED here, so XLA never inserts a global relayout copy (the
    round-1 failure mode of relayouting an existing seq-major cache).
    Prompts are right-padded; padding keys carry segment id 0 so decode
    steps never attend to them. quantize_cache: False = bf16 cache;
    True | "int8" = int8 values + per-(token, head) scales ({k,v} int8 +
    {k_scale,v_scale} (L, B, KVH, S)); "int4" = nibble-packed token
    pairs ({k4,v4} (L, B, KVH, ceil(S/2), Dh) int8 + even/odd-split
    {k_scale,v_scale} (L, B, 2, KVH, ceil(S/2)) — even/odd plane is
    dim 2, AHEAD of heads; see _quantize_kv4 and _cache_constraint).
    """
    b, s, d = inputs_embeds.shape
    h_, kvh, dh = cfg.num_heads // tp, cfg.kv_heads // tp, cfg.head_size
    red = (
        (lambda y: jax.lax.psum(y, tp_axis))
        if tp_axis is not None and tp > 1
        else (lambda y: y)
    )
    cos, sin = rope_cos_sin(
        positions, cfg.head_size, cfg.rope_theta, cfg.rope_scaling
    )

    rope = cfg.position_embedding == "rope"

    def scan_fn(x, layer_params):
        ap, mp = layer_params["attn"], layer_params["mlp"]
        y = _norm(cfg, x, layer_params["input_norm"]["scale"])
        q = dense(y, ap["wq"]).reshape(b, s, h_, dh)
        k = dense(y, ap["wk"]).reshape(b, s, kvh, dh)
        v = dense(y, ap["wv"]).reshape(b, s, kvh, dh)
        if rope:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        # ALiBi / sliding window: same dispatch as the training forward
        # (_layer) — MPT serving must not silently rotate, and Mistral
        # prompts longer than the window must mask (decode_step applies
        # the matching per-step bias/window to the cached keys)
        attn_out = attention(
            q, k, v, segment_ids, segment_ids, causal=True,
            impl=attn_impl,
            alibi=cfg.position_embedding == "alibi",
            sliding_window=cfg.sliding_window,
        )
        x = x + red(dense(attn_out.reshape(b, s, h_ * dh), ap["wo"]))
        y = _norm(cfg, x, layer_params["post_attn_norm"]["scale"])
        if cfg.gated_mlp:
            gated = _mlp_act(cfg)(dense(y, mp["gate"])) * dense(y, mp["up"])
            x = x + red(dense(gated, mp["down"]))
        else:
            x = x + red(dense(_mlp_act(cfg)(dense(y, mp["up"])), mp["down"]))
        kh = k.transpose(0, 2, 1, 3)  # (B, KVH, S, Dh) head-major
        vh = v.transpose(0, 2, 1, 3)
        if quantize_cache == "int4":
            if s % 2:  # pad one dead token slot (segment 0 downstream)
                kh = jnp.pad(kh, ((0, 0), (0, 0), (0, 1), (0, 0)))
                vh = jnp.pad(vh, ((0, 0), (0, 0), (0, 1), (0, 0)))
            kq, ks = _quantize_kv4(kh)
            vq, vs = _quantize_kv4(vh)
            return x, (kq, vq, ks, vs)
        if quantize_cache:
            kq, ks = _quantize_kv(kh)
            vq, vs = _quantize_kv(vh)
            return x, (kq, vq, ks, vs)
        return x, (kh.astype(cache_dtype), vh.astype(cache_dtype))

    x, cache_out = jax.lax.scan(scan_fn, inputs_embeds, params["layers"])
    hidden = _norm(cfg, x, params["final_norm"]["scale"])
    if quantize_cache == "int4":
        k_all, v_all, ks_all, vs_all = cache_out
        cache = {
            "k4": k_all,
            "v4": v_all,
            "k_scale": ks_all,
            "v_scale": vs_all,
        }
    elif quantize_cache:
        k_all, v_all, ks_all, vs_all = cache_out
        cache = {
            "k": k_all,
            "v": v_all,
            "k_scale": ks_all,
            "v_scale": vs_all,
        }
    else:
        k_all, v_all = cache_out
        cache = {"k": k_all, "v": v_all}
    # NOTE: in production the cache never crosses a jit boundary —
    # ops/generate.py compiles prefill+decode as ONE program (its
    # docstring records the two-program layout-mismatch failure mode).
    # The standalone _prefill_phase jit is diagnostics/tests only and
    # pins no layouts.
    return hidden, cache


def _decode_attend(
    q: jnp.ndarray,  # (B, 1, H, Dh)
    kp: jnp.ndarray,  # (B, KVH, Sp, Dh) HEAD-MAJOR prompt keys (bf16/int8)
    vp: jnp.ndarray,
    kg: jnp.ndarray,  # (B, KVH, Sg, Dh) HEAD-MAJOR generated keys
    vg: jnp.ndarray,
    prompt_seg: jnp.ndarray,  # (B, Sp) 0 = invalid
    gen_valid: jnp.ndarray,  # (B, Sg) bool
    kp_scale: Optional[jnp.ndarray] = None,  # (B, KVH, Sp) int8-KV scales
    vp_scale: Optional[jnp.ndarray] = None,
    kg_scale: Optional[jnp.ndarray] = None,  # (B, KVH, Sg) int8 gen scales
    vg_scale: Optional[jnp.ndarray] = None,
    bias_p: Optional[jnp.ndarray] = None,  # (B, H, Sp) ALiBi bias
    bias_g: Optional[jnp.ndarray] = None,  # (B, H, Sg)
    beam_k: int = 1,
) -> jnp.ndarray:
    """Single-query attention over split prompt/generated caches with one
    softmax across both (logits are tiny; no KV concat is materialized).

    GQA runs grouped: q is folded to (B, KVH, G, Dh) and contracted
    against the raw KV-head caches — no jnp.repeat materialization, so
    decode KV traffic is the true KVH-sized cache for Mistral/Gemma-class
    checkpoints (for MHA, G == 1 and the shapes are unchanged).

    beam_k > 1 (beam search, ops/beam.py): q and the GEN cache carry
    B*K rows while the read-only prompt cache (kp/vp + scales + seg +
    bias_p) stays at B item rows — beams fold into an extra einsum batch
    dim exactly like GQA groups fold over kv heads, so the dominant
    prompt KV is neither duplicated in HBM nor re-read per beam. Only
    the tiny per-item tensors (segment ids, scales, bias rows) repeat.

    This XLA body is the numerics oracle for the fused Pallas kernel
    (ops/decode_attention.py, dispatched in decode_step) and the
    GQA/CPU fallback."""
    b, _, h, dh = q.shape
    kvh = kp.shape[1]
    sp = kp.shape[2]
    g = h // kvh
    scale = dh**-0.5
    q3 = q[:, 0].reshape(b, kvh, g, dh)  # head-major groups
    # int8 prompt cache: values convert without their scale (the convert
    # fuses into the dot's operand pipeline); per-(token, head) scales
    # fold into the TINY logits / probability tensors instead of a
    # materialized dequantized KV copy.
    if beam_k > 1:
        bb = b // beam_k
        assert kp.shape[0] == bb, (kp.shape, b, beam_k)
        lp = jnp.einsum(
            "bjngd,bnkd->bjngk",
            q3.reshape(bb, beam_k, kvh, g, dh),
            kp.astype(q3.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, kvh, g, sp) * scale
        # per-item small tensors broadcast to the B*K row space
        prompt_seg = jnp.repeat(prompt_seg, beam_k, axis=0)
        if kp_scale is not None:
            kp_scale = jnp.repeat(kp_scale, beam_k, axis=0)
        if vp_scale is not None:
            vp_scale = jnp.repeat(vp_scale, beam_k, axis=0)
        if bias_p is not None:
            bias_p = jnp.repeat(bias_p, beam_k, axis=0)
    else:
        lp = jnp.einsum("bngd,bnkd->bngk", q3, kp.astype(q3.dtype),
                        preferred_element_type=jnp.float32) * scale
    if kp_scale is not None:
        lp = lp * kp_scale.astype(jnp.float32)[:, :, None, :]
    lg = jnp.einsum("bngd,bnkd->bngk", q3, kg.astype(q3.dtype),
                    preferred_element_type=jnp.float32) * scale
    if kg_scale is not None:
        lg = lg * kg_scale.astype(jnp.float32)[:, :, None, :]
    if bias_p is not None:  # ALiBi: additive, after dequant scaling
        lp = lp + bias_p.reshape(b, kvh, g, sp)
    if bias_g is not None:
        lg = lg + bias_g.reshape(b, kvh, g, kg.shape[2])
    lp = jnp.where(prompt_seg[:, None, None, :] != 0, lp, -1e30)
    lg = jnp.where(gen_valid[:, None, None, :], lg, -1e30)
    logits = jnp.concatenate([lp, lg], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    pp, pg = probs[..., :sp], probs[..., sp:]
    if vp_scale is not None:
        pp = pp * vp_scale.astype(jnp.float32)[:, :, None, :]
    if vg_scale is not None:
        pg = pg * vg_scale.astype(jnp.float32)[:, :, None, :]
    if beam_k > 1:
        out = jnp.einsum(
            "bjngk,bnkd->bjngd",
            pp.astype(q3.dtype).reshape(b // beam_k, beam_k, kvh, g, sp),
            vp.astype(q3.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, kvh, g, dh)
    else:
        out = jnp.einsum("bngk,bnkd->bngd", pp.astype(q3.dtype),
                         vp.astype(q3.dtype),
                         preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bngk,bnkd->bngd", pg.astype(q3.dtype),
                           vg.astype(q3.dtype),
                           preferred_element_type=jnp.float32)
    return out.reshape(b, 1, h, dh).astype(q.dtype)


def decode_step(
    params: Params,
    cfg: LlamaConfig,
    token_embeds: jnp.ndarray,  # (B, 1, D)
    positions: jnp.ndarray,  # (B,) absolute position of this token
    prompt_cache: Params,  # read-only {k,v}: (L, B, KVH, Sp, Dh) head-major
    prompt_seg: jnp.ndarray,  # (B, Sp) 0 = padding
    gen_cache: Params,  # carried {k,v}: (L, B, Sg, KVH, Dh)
    step: jnp.ndarray,  # () int32 decode step (gen slot to write)
    allow_fused: bool = True,
    tp: int = 1,
    tp_axis: Optional[str] = None,
    beam_k: int = 1,
    gen_valid_override: Optional[jnp.ndarray] = None,
    write_slot: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Params]:
    """One decode step over the split cache: returns (fp32 logits (B, V),
    updated gen cache). The new token is written at gen slot `step`
    (lockstep across rows); its RoPE position is per-row `positions`.

    gen_valid_override (B, Sg) / write_slot (): the continuous-batching
    engine (ops/continuous.py) runs rows at PER-ROW local steps over a
    ring-buffered gen cache — the write column stays a single scalar
    (global_step % Sg, so the hot-loop write op is unchanged) while
    validity becomes per-row ring arithmetic computed by the caller.
    The fused Pallas kernel consumes gen_valid either way; rope-only
    (window/ALiBi key positions still assume lockstep slots).

    beam_k > 1 (ops/beam.py): token_embeds/positions/gen_cache carry
    B*K beam rows while the read-only prompt cache + prompt_seg stay at
    B item rows — row r attends its item's prompt (r // K) so the
    dominant prompt KV is never duplicated. Requires beams of an item
    in lockstep (same position every step — beam.py guarantees it).

    On TPU, the step dispatches to the fused Pallas kernel (MHA and
    GQA — GQA runs grouped in-kernel over the true KVH-sized caches)
    (ops/decode_attention.py:decode_attend_layer), passing the WHOLE
    stacked caches with the layer index as a scalar-prefetch argument —
    a per-layer XLA dynamic-slice cannot fuse into a Pallas custom call
    and materialized 96MB copies per layer (measured +16 ms/step at
    llava-7b b24). The XLA oracle (_decode_attend) remains the GQA/CPU
    path; set HALVA_DECODE_ATTN=xla to force it on TPU.

    allow_fused=False forces the XLA path regardless of env/backend —
    required when the step runs under a tensor-parallel mesh with
    sharding propagation (a Pallas custom call cannot be SPMD-
    partitioned; ops/generate.py sets this for model>1 meshes).

    tp/tp_axis: MANUAL tensor parallelism inside jax.shard_map (see
    prefill) — local heads = num_heads/tp, prompt/gen caches hold the
    local head slice, psum over `tp_axis` after wo/down. The fused
    Pallas decode kernel stays available per shard."""
    import os

    b = token_embeds.shape[0]
    h_, kvh, dh = cfg.num_heads // tp, cfg.kv_heads // tp, cfg.head_size
    red = (
        (lambda y: jax.lax.psum(y, tp_axis))
        if tp_axis is not None and tp > 1
        else (lambda y: y)
    )
    sg = gen_cache["k"].shape[3]
    cos, sin = rope_cos_sin(
        positions[:, None], cfg.head_size, cfg.rope_theta, cfg.rope_scaling
    )
    if gen_valid_override is not None:
        if cfg.position_embedding != "rope" or cfg.sliding_window:
            raise NotImplementedError(
                "per-row gen validity (continuous batching) supports "
                "rope-only, no sliding window — window/ALiBi key "
                "positions assume lockstep gen slots"
            )
        gen_valid = gen_valid_override
    else:
        gen_valid = (
            jnp.arange(sg, dtype=jnp.int32)[None, :] <= step
        ) & jnp.ones((b, 1), bool)
    if write_slot is None:
        write_slot = step

    quantized4 = "k4" in prompt_cache
    quantized = (not quantized4) and "k_scale" in prompt_cache
    rope = cfg.position_embedding == "rope"
    alibi = cfg.position_embedding == "alibi"
    window = cfg.sliding_window
    sp_true = prompt_seg.shape[1]
    # prompt-side tensors live in the B-item row space; beams of an item
    # share positions (lockstep), so item positions = every beam_k-th row
    bb = b // beam_k
    pos_item = (
        positions.reshape(bb, beam_k)[:, 0] if beam_k > 1 else positions
    )
    # cached-key positions: prompts are right-padded contiguous from 0
    # (position == index; padding masked by segment 0), gen slot s' sits
    # at position = positions - step + s'
    if alibi or window is not None:
        kpos_p = jnp.broadcast_to(
            jnp.arange(sp_true, dtype=jnp.int32)[None, :], (bb, sp_true)
        )
        kpos_g = (
            positions[:, None]
            - step
            + jnp.arange(sg, dtype=jnp.int32)[None, :]
        )
    if window is not None:
        # Mistral local attention: drop keys older than the window (the
        # prefill kernel applied the same rule inside the prompt)
        gen_valid = gen_valid & (positions[:, None] - kpos_g < window)
    bias_p = bias_g = None
    if alibi:
        from halva_tpu.ops.attention import alibi_bias

        bias_p = alibi_bias(h_, pos_item[:, None], kpos_p)[:, :, 0]
        bias_g = alibi_bias(h_, positions[:, None], kpos_g)[:, :, 0]
    # prompt keys outside the window: mask via segment ids (the fused
    # kernel is only used when the whole cache fits the window — see
    # pos_ok below — so the masked seg never reaches it)
    if window is not None and sp_true + sg > window:
        prompt_seg = jnp.where(
            pos_item[:, None] - kpos_p < window, prompt_seg, 0
        )
    # dh must be lane-aligned (128): the fused kernel's bf16
    # minor-dim-insertion reshapes ((H, D) -> (H, 1, D)) are only legal
    # Mosaic relayouts when the lane dim is a 128-multiple — measured
    # on-chip at dh=64: `tpu.reshape (1x16x64) -> (16x1x64)` fails to
    # compile. Small/test configs fall back to the XLA oracle.
    lane_ok = dh % 128 == 0 and sg % 128 == 0
    if quantized4:
        # XLA-oracle view of the packed cache: attention is permutation-
        # invariant over kv positions, so the fallback attends in
        # even/odd order with matching de-interleaved segment ids —
        # no re-interleave op needed (the fused kernel consumes the
        # packed layout natively).
        from halva_tpu.ops.decode_attention import seg_even_odd

        seg_eo_flat = seg_even_odd(prompt_seg).reshape(bb, -1)
        if bias_p is not None:
            bp = bias_p
            if bp.shape[-1] % 2:
                bp = jnp.pad(bp, ((0, 0), (0, 0), (0, 1)))
            # match the even/odd key order of the packed-cache fallback
            bias_p = jnp.concatenate(
                [bp[..., 0::2], bp[..., 1::2]], axis=-1
            )
    # the fused kernel computes RoPE-style plain dot logits with no bias
    # or window: ALiBi always takes the XLA oracle; a sliding window is
    # fused-safe only when the whole cache fits inside it (then the
    # window masks nothing)
    pos_ok = rope and (window is None or sp_true + sg <= window)
    # scoped-VMEM feasibility: the kernel holds the WHOLE-Sg gen-cache
    # blocks in VMEM, so a large max_new_tokens (eval CLI default 1024)
    # cannot compile under the default 16MB budget — fall back to the
    # XLA oracle instead of dying in the pallas compile, or raise
    # HALVA_SCOPED_VMEM_MB (see fused_budget_ok)
    from halva_tpu.ops.decode_attention import fused_budget_ok

    vmem_ok = fused_budget_ok(
        kvh, gen_cache["k"].shape[3], dh,
        gen_cache["k"].dtype.itemsize,
        (prompt_cache["k4"] if quantized4 else prompt_cache["k"])
        .dtype.itemsize,
        quantized4,
    )
    fused = (
        h_ % kvh == 0  # GQA runs grouped in-kernel (MHA: G == 1)
        and lane_ok
        and pos_ok
        and vmem_ok
        and allow_fused
        and jax.default_backend() == "tpu"
        and os.environ.get("HALVA_DECODE_ATTN", "fused") == "fused"
    )
    # W4 serving weights: dense layers carry stacked int4 (ops/w4_matmul).
    # The decode scan then runs WITHOUT xs weight slices — every matmul
    # streams int4 blocks from the stacked arrays via the layer index
    # (an XLA per-layer slice would materialize, like the KV case).
    w4 = "kernel_q4p" in params["layers"]["attn"]["wq"]
    # HALVA_DECODE_ATTN=xla must reach the w4 path too: fall back to the
    # generic scan (dense() handles kernel_q4p; attention uses the XLA
    # oracle) so int4 serving retains the kernel escape hatch. Under
    # manual TP the weights are tp-packed (quantize_params_int4_host
    # tp=...; verified by partition.manual_tp_ready) so each shard's
    # block is self-consistent and the fused scan runs on local heads.
    if w4 and (h_ % kvh == 0) and lane_ok and pos_ok and vmem_ok and (
        allow_fused
    ) and os.environ.get("HALVA_DECODE_ATTN", "fused") == "fused":
        return _decode_step_w4(
            params, cfg, token_embeds, positions, prompt_cache,
            prompt_seg, gen_cache, write_slot, cos, sin, gen_valid,
            tp=tp, tp_axis=tp_axis, beam_k=beam_k,
        )

    def scan_fn(carry, layer_params):
        x, gen, li = carry
        ap, mp = layer_params["attn"], layer_params["mlp"]
        y = _norm(cfg, x, layer_params["input_norm"]["scale"])
        q = dense(y, ap["wq"]).reshape(b, 1, h_, dh)
        k = dense(y, ap["wk"]).reshape(b, 1, kvh, dh)
        v = dense(y, ap["wv"]).reshape(b, 1, kvh, dh)
        if rope:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        gen = _write_gen(gen, k, v, li, write_slot)

        if fused:
            from halva_tpu.ops.decode_attention import decode_attend_layer

            attn_out = decode_attend_layer(
                q, prompt_cache, prompt_seg, gen, gen_valid, li,
                beam_k=beam_k,
            )
        else:
            if quantized4:
                kp4 = jax.lax.dynamic_index_in_dim(
                    prompt_cache["k4"], li, 0, False
                )
                vp4 = jax.lax.dynamic_index_in_dim(
                    prompt_cache["v4"], li, 0, False
                )
                klo, khi = _unpack_kv4(kp4)
                vlo, vhi = _unpack_kv4(vp4)
                # (B, KVH, 2*S2, Dh) int8 nibble values, even-odd order
                kp = jnp.concatenate([klo, khi], axis=2).astype(jnp.int8)
                vp = jnp.concatenate([vlo, vhi], axis=2).astype(jnp.int8)
                # scales (B, 2, KVH, S2) -> (B, KVH, 2*S2) in the same
                # [evens..., odds...] order as the concatenated values
                kps4 = jax.lax.dynamic_index_in_dim(
                    prompt_cache["k_scale"], li, 0, False
                )
                vps4 = jax.lax.dynamic_index_in_dim(
                    prompt_cache["v_scale"], li, 0, False
                )
                kps = jnp.concatenate([kps4[:, 0], kps4[:, 1]], axis=2)
                vps = jnp.concatenate([vps4[:, 0], vps4[:, 1]], axis=2)
                seg_for_attend = seg_eo_flat
            else:
                kp = jax.lax.dynamic_index_in_dim(
                    prompt_cache["k"], li, 0, False
                )
                vp = jax.lax.dynamic_index_in_dim(
                    prompt_cache["v"], li, 0, False
                )
                kps = vps = None
                if quantized:
                    kps = jax.lax.dynamic_index_in_dim(
                        prompt_cache["k_scale"], li, 0, False
                    )
                    vps = jax.lax.dynamic_index_in_dim(
                        prompt_cache["v_scale"], li, 0, False
                    )
                seg_for_attend = prompt_seg
            gl = {
                kk: jax.lax.dynamic_index_in_dim(vv, li, 0, False)
                for kk, vv in gen.items()
            }
            attn_out = _decode_attend(
                q,
                kp,
                vp,
                gl["k"],
                gl["v"],
                seg_for_attend,
                gen_valid,
                kp_scale=kps,
                vp_scale=vps,
                kg_scale=gl.get("k_scale"),
                vg_scale=gl.get("v_scale"),
                bias_p=bias_p,
                bias_g=bias_g,
                beam_k=beam_k,
            )
        x = x + red(dense(attn_out.reshape(b, 1, h_ * dh), ap["wo"]))
        y = _norm(cfg, x, layer_params["post_attn_norm"]["scale"])
        if cfg.gated_mlp:
            gated = _mlp_act(cfg)(dense(y, mp["gate"])) * dense(y, mp["up"])
            x = x + red(dense(gated, mp["down"]))
        else:
            x = x + red(dense(_mlp_act(cfg)(dense(y, mp["up"])), mp["down"]))
        return (x, gen, li + 1), None

    (x, new_gen, _), _ = jax.lax.scan(
        scan_fn,
        (token_embeds, gen_cache, jnp.int32(0)),
        params["layers"],
    )
    hidden = _norm(cfg, x, params["final_norm"]["scale"])
    logits = lm_logits(params, cfg, hidden)[:, 0]
    return logits, new_gen


def _write_gen(gen: Params, k, v, li, step) -> Params:
    """Write this layer's new KV (B, 1, KVH, Dh) at (li, :, :, step, :)
    of the head-major gen cache, quantizing when the cache is int8."""
    k_hm = k.transpose(0, 2, 1, 3)  # (B, KVH, 1, Dh)
    v_hm = v.transpose(0, 2, 1, 3)
    out = dict(gen)
    if "k_scale" in gen:
        kq, ks = _quantize_kv(k_hm)
        vq, vs = _quantize_kv(v_hm)
        out["k"] = jax.lax.dynamic_update_slice(
            gen["k"], kq[None], (li, 0, 0, step, 0)
        )
        out["v"] = jax.lax.dynamic_update_slice(
            gen["v"], vq[None], (li, 0, 0, step, 0)
        )
        out["k_scale"] = jax.lax.dynamic_update_slice(
            gen["k_scale"], ks[None], (li, 0, 0, step)
        )
        out["v_scale"] = jax.lax.dynamic_update_slice(
            gen["v_scale"], vs[None], (li, 0, 0, step)
        )
        return out
    out["k"] = jax.lax.dynamic_update_slice(
        gen["k"], k_hm.astype(gen["k"].dtype)[None], (li, 0, 0, step, 0)
    )
    out["v"] = jax.lax.dynamic_update_slice(
        gen["v"], v_hm.astype(gen["v"].dtype)[None], (li, 0, 0, step, 0)
    )
    return out


def _verify_attend(
    q: jnp.ndarray,  # (B, Kq, H, Dh) roped queries
    kp: jnp.ndarray,  # (B, KVH, Sp, Dh) prompt keys (bf16/int8 values)
    vp: jnp.ndarray,
    kc: jnp.ndarray,  # (B, Kq, KVH, Dh) fresh roped candidate keys
    vc: jnp.ndarray,
    prompt_seg: jnp.ndarray,  # (B, Sp) 0 = invalid
    kg: jnp.ndarray,  # (B, KVH, Sg, Dh) gen cache
    vg: jnp.ndarray,
    gen_len: jnp.ndarray,  # (B,) valid gen slots (same for every query)
    kp_scale: Optional[jnp.ndarray] = None,  # (B, KVH, Sp)
    vp_scale: Optional[jnp.ndarray] = None,
    kg_scale: Optional[jnp.ndarray] = None,  # (B, KVH, Sg)
    vg_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """K-query verify attention: ONE softmax over [prompt | gen |
    candidates]. Query i attends the full prompt, gen slots < gen_len,
    and candidates j <= i (the K fresh tokens are causal among
    themselves and are NOT read from the gen cache — their K/V arrive as
    in-registers `kc`/`vc`, so rejected drafts never need a cache
    rollback). The single-query decode oracle (_decode_attend) is the
    Kq == 1, no-candidate special case of this; numerics (int8 scales
    folded into logits/probs, fp32 softmax) match it exactly."""
    b, kq, h, dh = q.shape
    kvh, sp = kp.shape[1], kp.shape[2]
    sg = kg.shape[2]
    g = h // kvh
    scale = dh**-0.5
    dt = q.dtype
    q5 = q.reshape(b, kq, kvh, g, dh)
    lp = jnp.einsum(
        "bqngd,bnsd->bqngs", q5, kp.astype(dt),
        preferred_element_type=jnp.float32,
    ) * scale
    if kp_scale is not None:
        lp = lp * kp_scale.astype(jnp.float32)[:, None, :, None, :]
    lg = jnp.einsum(
        "bqngd,bnsd->bqngs", q5, kg.astype(dt),
        preferred_element_type=jnp.float32,
    ) * scale
    if kg_scale is not None:
        lg = lg * kg_scale.astype(jnp.float32)[:, None, :, None, :]
    lc = jnp.einsum(
        "bqngd,bjnd->bqngj", q5, kc.astype(dt),
        preferred_element_type=jnp.float32,
    ) * scale
    lp = jnp.where(prompt_seg[:, None, None, None, :] != 0, lp, -1e30)
    gen_ok = (
        jnp.arange(sg, dtype=jnp.int32)[None, :] < gen_len[:, None]
    )  # (B, Sg)
    lg = jnp.where(gen_ok[:, None, None, None, :], lg, -1e30)
    causal = (
        jnp.arange(kq, dtype=jnp.int32)[:, None]
        >= jnp.arange(kq, dtype=jnp.int32)[None, :]
    )  # (Kq, Kc)
    lc = jnp.where(causal[None, :, None, None, :], lc, -1e30)
    logits = jnp.concatenate([lp, lg, lc], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    pp = probs[..., :sp]
    pg = probs[..., sp : sp + sg]
    pc = probs[..., sp + sg :]
    if vp_scale is not None:
        pp = pp * vp_scale.astype(jnp.float32)[:, None, :, None, :]
    if vg_scale is not None:
        pg = pg * vg_scale.astype(jnp.float32)[:, None, :, None, :]
    out = jnp.einsum(
        "bqngs,bnsd->bqngd", pp.astype(dt), vp.astype(dt),
        preferred_element_type=jnp.float32,
    )
    out = out + jnp.einsum(
        "bqngs,bnsd->bqngd", pg.astype(dt), vg.astype(dt),
        preferred_element_type=jnp.float32,
    )
    out = out + jnp.einsum(
        "bqngj,bjnd->bqngd", pc.astype(dt), vc.astype(dt),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, kq, h, dh).astype(q.dtype)


def write_gen_candidates(
    gen: Params,
    kc: jnp.ndarray,  # (L, B, K, KVH, Dh) roped candidate keys, all layers
    vc: jnp.ndarray,
    gen_len: jnp.ndarray,  # (B,) per-row write offset
) -> Params:
    """Write all K candidate KVs of every layer at per-row slots
    gen_len[b]..gen_len[b]+K-1 of the head-major (L, B, KVH, Sg, Dh) gen
    cache, quantizing when the cache is int8. ONE vectorized write per
    verify step (vmapped dynamic_update_slice over the batch dim — the
    layer dim rides along because every layer shares the row's offset),
    not L per-layer writes. Rejected candidates need no rollback:
    validity is derived from gen_len, and the next verify step's write
    window (starting at the advanced gen_len) covers every rejected
    slot because it advances by at least 1 and writes K slots."""
    k_hm = kc.transpose(0, 1, 3, 2, 4)  # (L, B, KVH, K, Dh)
    v_hm = vc.transpose(0, 1, 3, 2, 4)
    out = dict(gen)

    def wr5(dst, upd, off):  # (L, KVH, Sg, Dh) <- (L, KVH, K, Dh)
        return jax.lax.dynamic_update_slice(
            dst, upd.astype(dst.dtype), (0, 0, off, 0)
        )

    def wr4(dst, upd, off):  # scales (L, KVH, Sg) <- (L, KVH, K)
        return jax.lax.dynamic_update_slice(
            dst, upd.astype(dst.dtype), (0, 0, off)
        )

    w5 = jax.vmap(wr5, in_axes=(1, 1, 0), out_axes=1)
    w4s = jax.vmap(wr4, in_axes=(1, 1, 0), out_axes=1)
    if "k_scale" in gen:
        kq_, ks = _quantize_kv(k_hm)
        vq_, vs = _quantize_kv(v_hm)
        out["k"] = w5(gen["k"], kq_, gen_len)
        out["v"] = w5(gen["v"], vq_, gen_len)
        out["k_scale"] = w4s(gen["k_scale"], ks, gen_len)
        out["v_scale"] = w4s(gen["v_scale"], vs, gen_len)
        return out
    out["k"] = w5(gen["k"], k_hm, gen_len)
    out["v"] = w5(gen["v"], v_hm, gen_len)
    return out


def _verify_step_w4(
    params: Params,
    cfg: LlamaConfig,
    token_embeds: jnp.ndarray,  # (B, K, D)
    positions: jnp.ndarray,  # (B,) absolute position of token 0
    prompt_cache: Params,
    prompt_seg: jnp.ndarray,
    gen_cache: Params,
    gen_len: jnp.ndarray,  # (B,)
) -> Tuple[jnp.ndarray, Params]:
    """verify_step body for stacked-int4 serving weights — the fused
    counterpart of the XLA verify scan, built exactly like
    _decode_step_w4: every matmul streams int4 blocks of the stacked
    weights (w4_dense_stacked, B*K activation rows — weight streaming,
    the dominant term, is UNCHANGED vs a 1-token decode step) and
    attention runs the folded Pallas kernel
    (ops/decode_attention.py:fold_attend_layer shared_gen mode): the K
    candidate queries of each row ride ONE batched dot against the
    whole stacked prompt cache, the shared gen cache masks by gen_len,
    and the fresh candidate KVs merge causally. This removes the two
    costs that made the round-4 XLA verify ~3x a fused decode step
    (BENCH_spec_r04.json): per-layer dynamic-slice materialization of
    the prompt cache and XLA dequant copies of its int8/int4 values."""
    from halva_tpu.ops.decode_attention import fold_attend_layer
    from halva_tpu.ops.w4_matmul import w4_dense_stacked

    b, kq, dm = token_embeds.shape
    h_, kvh, dh = cfg.num_heads, cfg.kv_heads, cfg.head_size
    sg = gen_cache["k"].shape[3]
    pos_k = positions[:, None] + jnp.arange(kq, dtype=jnp.int32)[None, :]
    cos, sin = rope_cos_sin(
        pos_k, cfg.head_size, cfg.rope_theta, cfg.rope_scaling
    )
    gen_valid = (
        jnp.arange(sg, dtype=jnp.int32)[None, :] < gen_len[:, None]
    )
    lyr = params["layers"]

    def idx(a, li):
        return jax.lax.dynamic_index_in_dim(a, li, 0, False)

    def scan_fn(carry, _):
        x, li = carry  # (B, K, D)
        y = _norm(cfg, x, idx(lyr["input_norm"]["scale"], li))
        y2 = y.reshape(b * kq, dm)
        q = w4_dense_stacked(y2, lyr["attn"]["wq"], li).reshape(
            b, kq, h_, dh
        )
        k = w4_dense_stacked(y2, lyr["attn"]["wk"], li).reshape(
            b, kq, kvh, dh
        )
        v = w4_dense_stacked(y2, lyr["attn"]["wv"], li).reshape(
            b, kq, kvh, dh
        )
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = fold_attend_layer(
            q, prompt_cache, prompt_seg, gen_cache, gen_valid, li,
            fold_k=kq, shared_gen=True, candidates=(k, v),
        )
        x = x + w4_dense_stacked(
            attn.reshape(b * kq, h_ * dh), lyr["attn"]["wo"], li
        ).reshape(b, kq, dm)
        y = _norm(cfg, x, idx(lyr["post_attn_norm"]["scale"], li))
        y2 = y.reshape(b * kq, dm)
        if cfg.gated_mlp:
            gated = _mlp_act(cfg)(
                w4_dense_stacked(y2, lyr["mlp"]["gate"], li)
            ) * w4_dense_stacked(y2, lyr["mlp"]["up"], li)
            x = x + w4_dense_stacked(
                gated, lyr["mlp"]["down"], li
            ).reshape(b, kq, dm)
        else:
            x = x + w4_dense_stacked(
                _mlp_act(cfg)(w4_dense_stacked(y2, lyr["mlp"]["up"], li)),
                lyr["mlp"]["down"],
                li,
            ).reshape(b, kq, dm)
        return (x, li + 1), (k, v)

    (x, _), (kc_all, vc_all) = jax.lax.scan(
        scan_fn, (token_embeds, jnp.int32(0)), None,
        length=cfg.num_layers,
    )
    hidden = _norm(cfg, x, params["final_norm"]["scale"])
    logits = lm_logits(params, cfg, hidden)  # (B, K, V) fp32
    new_gen = write_gen_candidates(gen_cache, kc_all, vc_all, gen_len)
    return logits, new_gen


def verify_step(
    params: Params,
    cfg: LlamaConfig,
    token_embeds: jnp.ndarray,  # (B, K, D) [cur, draft_1..draft_{K-1}]
    positions: jnp.ndarray,  # (B,) absolute position of token 0
    prompt_cache: Params,
    prompt_seg: jnp.ndarray,  # (B, Sp)
    gen_cache: Params,
    gen_len: jnp.ndarray,  # (B,) valid gen-cache slots
    allow_fused: bool = True,
) -> Tuple[jnp.ndarray, Params]:
    """Speculative-verification step: score K candidate tokens per row in
    ONE pass over the model (ops/speculative.py drives it). Returns
    (fp32 logits (B, K, V) — position i's next-token logits — and the
    gen cache with ALL K candidates' KV written at slots
    gen_len..gen_len+K-1; the caller advances gen_len by the accepted
    count only).

    The prompt cache streams ONCE for K candidate positions instead of
    once per token — decode at serving shapes is prompt-KV-bandwidth
    bound (docs/PERF.md decode attribution), which is where speculative
    decoding's win lives on TPU.

    RoPE-position models only (no ALiBi/sliding-window: the speculative
    entry point refuses those configs and callers fall back to plain
    greedy). Weights go through dense(): int8/int4/NF4/LoRA variants all
    work; with quant.set_w4a8 the K-token matmuls take the int8-MXU
    path. Beyond-reference feature: the reference's HF generate has no
    speculative mode (eval_hall/model_vqa_loader.py:102-111 is plain
    greedy/sampling)."""
    import os

    b, kq, _ = token_embeds.shape
    h_, kvh, dh = cfg.num_heads, cfg.kv_heads, cfg.head_size
    if cfg.position_embedding != "rope" or cfg.sliding_window is not None:
        raise NotImplementedError(
            "verify_step supports RoPE, no-sliding-window configs"
        )
    # W4 serving trees take the fused verify (folded Pallas attention +
    # stacked-int4 matmul streaming) under the same feasibility gates as
    # decode_step's w4 dispatch; everything else stays on the XLA scan
    # below (the CPU/parity oracle).
    from halva_tpu.ops.decode_attention import fold_budget_ok

    sg_ = gen_cache["k"].shape[3]
    quantized4_ = "k4" in prompt_cache
    w4 = "kernel_q4p" in params["layers"]["attn"]["wq"]
    lane_ok = dh % 128 == 0 and sg_ % 128 == 0
    if (
        w4
        and allow_fused
        and h_ % kvh == 0
        and lane_ok
        and fold_budget_ok(
            kvh, sg_, dh, gen_cache["k"].dtype.itemsize,
            (prompt_cache["k4"] if quantized4_ else prompt_cache["k"])
            .dtype.itemsize,
            quantized4_, 1,
        )
        and jax.default_backend() == "tpu"
        and os.environ.get("HALVA_DECODE_ATTN", "fused") == "fused"
    ):
        return _verify_step_w4(
            params, cfg, token_embeds, positions, prompt_cache,
            prompt_seg, gen_cache, gen_len,
        )
    pos_k = positions[:, None] + jnp.arange(kq, dtype=jnp.int32)[None, :]
    cos, sin = rope_cos_sin(
        pos_k, cfg.head_size, cfg.rope_theta, cfg.rope_scaling
    )
    quantized4 = "k4" in prompt_cache
    quantized = (not quantized4) and "k_scale" in prompt_cache
    if quantized4:
        from halva_tpu.ops.decode_attention import seg_even_odd

        bb = prompt_seg.shape[0]
        seg_eo_flat = seg_even_odd(prompt_seg).reshape(bb, -1)

    def scan_fn(carry, layer_params):
        x, li = carry  # x (B, K, D)
        ap, mp = layer_params["attn"], layer_params["mlp"]
        y = _norm(cfg, x, layer_params["input_norm"]["scale"])
        q = dense(y, ap["wq"]).reshape(b, kq, h_, dh)
        k = dense(y, ap["wk"]).reshape(b, kq, kvh, dh)
        v = dense(y, ap["wv"]).reshape(b, kq, kvh, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if quantized4:
            kp4 = jax.lax.dynamic_index_in_dim(
                prompt_cache["k4"], li, 0, False
            )
            vp4 = jax.lax.dynamic_index_in_dim(
                prompt_cache["v4"], li, 0, False
            )
            klo, khi = _unpack_kv4(kp4)
            vlo, vhi = _unpack_kv4(vp4)
            kp = jnp.concatenate([klo, khi], axis=2).astype(jnp.int8)
            vp = jnp.concatenate([vlo, vhi], axis=2).astype(jnp.int8)
            kps4 = jax.lax.dynamic_index_in_dim(
                prompt_cache["k_scale"], li, 0, False
            )
            vps4 = jax.lax.dynamic_index_in_dim(
                prompt_cache["v_scale"], li, 0, False
            )
            kps = jnp.concatenate([kps4[:, 0], kps4[:, 1]], axis=2)
            vps = jnp.concatenate([vps4[:, 0], vps4[:, 1]], axis=2)
            seg_for_attend = seg_eo_flat
        else:
            kp = jax.lax.dynamic_index_in_dim(prompt_cache["k"], li, 0, False)
            vp = jax.lax.dynamic_index_in_dim(prompt_cache["v"], li, 0, False)
            kps = vps = None
            if quantized:
                kps = jax.lax.dynamic_index_in_dim(
                    prompt_cache["k_scale"], li, 0, False
                )
                vps = jax.lax.dynamic_index_in_dim(
                    prompt_cache["v_scale"], li, 0, False
                )
            seg_for_attend = prompt_seg
        gl = {
            kk: jax.lax.dynamic_index_in_dim(vv, li, 0, False)
            for kk, vv in gen_cache.items()
        }
        attn_out = _verify_attend(
            q, kp, vp, k, v, seg_for_attend,
            gl["k"], gl["v"], gen_len,
            kp_scale=kps, vp_scale=vps,
            kg_scale=gl.get("k_scale"), vg_scale=gl.get("v_scale"),
        )
        x = x + dense(attn_out.reshape(b, kq, h_ * dh), ap["wo"])
        y = _norm(cfg, x, layer_params["post_attn_norm"]["scale"])
        if cfg.gated_mlp:
            gated = _mlp_act(cfg)(dense(y, mp["gate"])) * dense(y, mp["up"])
            x = x + dense(gated, mp["down"])
        else:
            x = x + dense(_mlp_act(cfg)(dense(y, mp["up"])), mp["down"])
        return (x, li + 1), (k, v)

    (x, _), (kc_all, vc_all) = jax.lax.scan(
        scan_fn, (token_embeds, jnp.int32(0)), params["layers"]
    )
    hidden = _norm(cfg, x, params["final_norm"]["scale"])
    logits = lm_logits(params, cfg, hidden)  # (B, K, V) fp32
    new_gen = write_gen_candidates(gen_cache, kc_all, vc_all, gen_len)
    return logits, new_gen


def _decode_step_w4(
    params: Params,
    cfg: LlamaConfig,
    token_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    prompt_cache: Params,
    prompt_seg: jnp.ndarray,
    gen_cache: Params,
    step: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    gen_valid: jnp.ndarray,
    tp: int = 1,
    tp_axis: Optional[str] = None,
    beam_k: int = 1,
) -> Tuple[jnp.ndarray, Params]:
    """decode_step body for stacked-int4 serving weights: the scan
    carries only the layer counter — every matmul streams int4 blocks of
    the stacked (L, K, N) weights through ops/w4_matmul.w4_dense_stacked
    and attention through ops/decode_attention.decode_attend_layer, so
    no per-layer weight or cache slice is ever materialized. GQA runs
    grouped in the attention kernel.

    tp/tp_axis (manual shard_map TP, see prefill): requires weights
    quantized with quantize_params_int4_host(tp=tp) — each shard's
    packed block is then self-consistent (partition.manual_tp_ready
    verifies the stamp) — and psums the row-split wo/down outputs."""
    from halva_tpu.ops.decode_attention import decode_attend_layer
    from halva_tpu.ops.w4_matmul import w4_dense_stacked

    b = token_embeds.shape[0]
    h_, kvh, dh = cfg.num_heads // tp, cfg.kv_heads // tp, cfg.head_size
    red = (
        (lambda y: jax.lax.psum(y, tp_axis))
        if tp_axis is not None and tp > 1
        else (lambda y: y)
    )
    lyr = params["layers"]

    def idx(a, li):
        return jax.lax.dynamic_index_in_dim(a, li, 0, False)

    def scan_fn(carry, _):
        x, gen, li = carry
        y = _norm(cfg, x, idx(lyr["input_norm"]["scale"], li))
        y2 = y[:, 0]  # (B, D)
        q = w4_dense_stacked(y2, lyr["attn"]["wq"], li).reshape(
            b, 1, h_, dh
        )
        k = w4_dense_stacked(y2, lyr["attn"]["wk"], li).reshape(
            b, 1, kvh, dh
        )
        v = w4_dense_stacked(y2, lyr["attn"]["wv"], li).reshape(
            b, 1, kvh, dh
        )
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        gen = _write_gen(gen, k, v, li, step)

        attn_out = decode_attend_layer(
            q, prompt_cache, prompt_seg, gen, gen_valid, li,
            beam_k=beam_k,
        )
        x = x + red(w4_dense_stacked(
            attn_out.reshape(b, h_ * dh), lyr["attn"]["wo"], li
        ))[:, None]
        y = _norm(cfg, x, idx(lyr["post_attn_norm"]["scale"], li))
        y2 = y[:, 0]
        if cfg.gated_mlp:
            gated = _mlp_act(cfg)(
                w4_dense_stacked(y2, lyr["mlp"]["gate"], li)
            ) * w4_dense_stacked(y2, lyr["mlp"]["up"], li)
            x = x + red(
                w4_dense_stacked(gated, lyr["mlp"]["down"], li)
            )[:, None]
        else:
            x = x + red(w4_dense_stacked(
                _mlp_act(cfg)(
                    w4_dense_stacked(y2, lyr["mlp"]["up"], li)
                ),
                lyr["mlp"]["down"],
                li,
            ))[:, None]
        return (x, gen, li + 1), None

    (x, new_gen, _), _ = jax.lax.scan(
        scan_fn,
        (token_embeds, gen_cache, jnp.int32(0)),
        None,
        length=cfg.num_layers,
    )
    hidden = _norm(cfg, x, params["final_norm"]["scale"])
    logits = lm_logits(params, cfg, hidden)[:, 0]
    return logits, new_gen
