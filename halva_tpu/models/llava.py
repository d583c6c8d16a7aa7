"""LLaVA-class multimodal model: vision tower + projector + Llama, with a
static-shape image-token splice.

TPU-first redesign of the reference's python-loop splice
(llava/model/llava_arch.py:85-394, `prepare_inputs_labels_for_multimodal`
and `..._signed`): the reference de-pads each row, splits it at the -200
sentinel, and concatenates ragged pieces — all dynamic shapes, hostile to
XLA. Here the splice is a fixed-shape *gather*: every output position
computes its source (text index or image-patch index) arithmetically, so the
whole batch splices in one fused kernel with zero host sync. HALVA data is
single-image single-turn (asserted by the reference, train_halva.py:341), so
one sentinel per row is faithful; rows with no image keep their text and get
a masked (segment-id 0) image block, which is numerically equivalent to the
reference's "append empty features" branch.

Output length is static: S_out = S_in + num_image_tokens - 1.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from halva_tpu.config import LlavaConfig
from halva_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from halva_tpu.models import llama, projector, vit

Params = Dict[str, Any]


def init_params(
    key: jax.Array, cfg: LlavaConfig, dtype=jnp.float32
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "llm": llama.init_params(k1, cfg.llm, dtype),
        "vision": vit.init_params(k2, cfg.vision, dtype),
        "projector": projector.init_params(k3, cfg, dtype),
    }


def encode_images(
    params: Params, cfg: LlavaConfig, images: jnp.ndarray
) -> jnp.ndarray:
    """(B, 3, H, W) -> (B, T, D_llm). The tower is frozen (reference
    clip_encoder.py:37 @no_grad); the projector is trainable."""
    if cfg.vision_tower_type == "radio":
        feats = jax.lax.stop_gradient(
            vit.encode_radio(
                params["vision"],
                cfg.vision,
                images,
                pixel_unshuffle=cfg.radio_pixel_unshuffle,
                skip_final_norm=cfg.radio_skip_final_norm,
            )
        )
    else:
        feats = jax.lax.stop_gradient(
            vit.encode(
                params["vision"],
                cfg.vision,
                images,
                select_layer=cfg.mm_vision_select_layer,
                select_feature=cfg.mm_vision_select_feature,
            )
        )
    return projector.apply(params["projector"], cfg, feats)


class Spliced(NamedTuple):
    embeds: jnp.ndarray  # (B, S_out, D)
    labels: jnp.ndarray  # (B, S_out)
    signs: jnp.ndarray  # (B, S_out)
    segment_ids: jnp.ndarray  # (B, S_out) 0 = padding/invalid
    positions: jnp.ndarray  # (B, S_out)


def splice_image_tokens(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,  # (B, S) with one IMAGE_TOKEN_INDEX or none
    image_features: jnp.ndarray,  # (B, T, D)
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) 0 = padding
    labels: Optional[jnp.ndarray] = None,  # (B, S)
    signs: Optional[jnp.ndarray] = None,  # (B, S)
) -> Spliced:
    """Static-shape gather splice. See module docstring.

    For output position j with image anchored at p (T patches):
      j <  p      -> text token j
      p <= j < p+T -> image patch j-p
      j >= p+T    -> text token j-T+1
    """
    b, s = input_ids.shape
    t = image_features.shape[1]
    s_out = s + t - 1

    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    if labels is None:
        labels = jnp.full((b, s), IGNORE_INDEX, jnp.int32)
    if signs is None:
        signs = jnp.zeros((b, s), jnp.int32)

    is_sentinel = input_ids == IMAGE_TOKEN_INDEX
    has_img = jnp.any(is_sentinel, axis=1)  # (B,)
    row_len = jnp.sum((segment_ids != 0).astype(jnp.int32), axis=1)
    img_pos = jnp.where(
        has_img, jnp.argmax(is_sentinel, axis=1).astype(jnp.int32), row_len
    )  # (B,)

    j = jnp.arange(s_out, dtype=jnp.int32)[None, :]  # (1, S_out)
    p = img_pos[:, None]  # (B, 1)
    in_img = (j >= p) & (j < p + t)
    after = j >= p + t
    text_idx = jnp.clip(jnp.where(after, j - (t - 1), j), 0, s - 1)
    patch_idx = jnp.clip(j - p, 0, t - 1)

    text_embeds = llama.embed(params["llm"], input_ids)  # (B, S, D)
    gathered_text = jnp.take_along_axis(
        text_embeds, text_idx[:, :, None], axis=1
    )
    gathered_img = jnp.take_along_axis(
        image_features.astype(gathered_text.dtype),
        patch_idx[:, :, None],
        axis=1,
    )
    embeds = jnp.where(in_img[:, :, None], gathered_img, gathered_text)

    def gather_i32(x, fill_in_img):
        g = jnp.take_along_axis(x, text_idx, axis=1)
        return jnp.where(in_img, fill_in_img, g)

    out_labels = gather_i32(labels, jnp.int32(IGNORE_INDEX))
    out_signs = gather_i32(signs, jnp.int32(0))
    # image block is valid only when the row really has an image
    img_seg = jnp.where(has_img[:, None], 1, 0).astype(segment_ids.dtype)
    out_seg = gather_i32(segment_ids.astype(jnp.int32), img_seg)
    # out-of-range tail for no-image rows: positions j in [row_len+T-1 ...)
    # gather padding (segment 0) already; nothing else needed.

    positions = jnp.broadcast_to(jnp.arange(s_out, dtype=jnp.int32), (b, s_out))
    return Spliced(embeds, out_labels, out_signs, out_seg, positions)


def splice_image_tokens_multi(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,  # (B, S) with up to K sentinels per row
    image_features: jnp.ndarray,  # (B, K, T, D)
    segment_ids: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    signs: Optional[jnp.ndarray] = None,
) -> Spliced:
    """Static-shape splice for multi-image rows (VILA multi-image and
    video-as-frames samples; reference llava_arch handles these via its
    images-list branch, llava_arch.py:100-105).

    Each of up to K sentinels expands to T patches; rows with fewer
    images leave the unused blocks masked (segment id 0) past the row end.
    Output length: S + K*(T-1).
    """
    b, s = input_ids.shape
    k, t = image_features.shape[1:3]
    s_out = s + k * (t - 1)

    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)
    if labels is None:
        labels = jnp.full((b, s), IGNORE_INDEX, jnp.int32)
    if signs is None:
        signs = jnp.zeros((b, s), jnp.int32)

    is_sent = input_ids == IMAGE_TOKEN_INDEX
    row_len = jnp.sum((segment_ids != 0).astype(jnp.int32), axis=1)
    n_real = jnp.sum(is_sent.astype(jnp.int32), axis=1)  # sentinels per row
    # positions of the first K sentinels per row; missing block i parks at
    # input position row_len + (i - n_real) so the masked blocks pack
    # contiguously right after the row's real content in output space
    order = jnp.cumsum(is_sent.astype(jnp.int32), axis=1)  # 1-based rank
    sent_pos = []
    for i in range(1, k + 1):
        hit = is_sent & (order == i)
        has = jnp.any(hit, axis=1)
        pos = jnp.where(
            has,
            jnp.argmax(hit, axis=1).astype(jnp.int32),
            row_len + ((i - 1) - n_real),
        )
        sent_pos.append((pos, has))

    j = jnp.arange(s_out, dtype=jnp.int32)[None, :]
    # output start of block i: p_i + i*(T-1)
    in_img = jnp.zeros((b, s_out), bool)
    patch_src = jnp.zeros((b, s_out), jnp.int32)  # flat (K*T) patch index
    img_valid = jnp.zeros((b, s_out), bool)
    blocks_before = jnp.zeros((b, s_out), jnp.int32)
    for i, (pos, has) in enumerate(sent_pos):
        q = (pos + i * (t - 1))[:, None]
        inside = (j >= q) & (j < q + t)
        in_img = in_img | inside
        patch_src = jnp.where(inside, i * t + (j - q), patch_src)
        img_valid = jnp.where(inside, has[:, None], img_valid)
        blocks_before = blocks_before + (j >= q + t).astype(jnp.int32)

    text_idx = jnp.clip(j - blocks_before * (t - 1), 0, s - 1)

    feats_flat = image_features.reshape(b, k * t, -1)
    text_embeds = llama.embed(params["llm"], input_ids)
    g_text = jnp.take_along_axis(text_embeds, text_idx[:, :, None], axis=1)
    g_img = jnp.take_along_axis(
        feats_flat.astype(g_text.dtype),
        jnp.clip(patch_src, 0, k * t - 1)[:, :, None],
        axis=1,
    )
    embeds = jnp.where(in_img[:, :, None], g_img, g_text)

    def gi(x, fill):
        g = jnp.take_along_axis(x, text_idx, axis=1)
        return jnp.where(in_img, fill, g)

    out_labels = gi(labels, jnp.int32(IGNORE_INDEX))
    out_signs = gi(signs, jnp.int32(0))
    seg_img = jnp.where(img_valid, 1, 0).astype(jnp.int32)
    out_seg = jnp.where(
        in_img, seg_img, jnp.take_along_axis(segment_ids, text_idx, axis=1)
    )
    positions = jnp.broadcast_to(
        jnp.arange(s_out, dtype=jnp.int32), (b, s_out)
    )
    return Spliced(embeds, out_labels, out_signs, out_seg, positions)


def forward_packed(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,  # (R, S) packed docs, image blocks = pad ids
    images: jnp.ndarray,  # (NI, 3, H, W) unique images
    img_src: jnp.ndarray,  # (M,) feature index per placement
    img_row: jnp.ndarray,  # (M,) target row; == R for padding entries
    img_col: jnp.ndarray,  # (M,) target start column
    segment_ids: jnp.ndarray,  # (R, S) per-document ids, 0 = padding
    positions: jnp.ndarray,  # (R, S) restart at 0 per document
    attn_impl: str = "auto",
    remat: bool = False,
    return_hidden: bool = False,
    constrain=None,
) -> jnp.ndarray:
    """Forward over packed rows (train/pack.py): the image-token splice
    is a host-planned scatter instead of the per-row gather above —
    each unique image is encoded ONCE and its T-patch feature block is
    written into every placement (pos and neg documents share the
    sample's vision forward; the unpacked path encodes each image
    twice). Padding scatter entries carry img_row == R and are dropped
    (jnp scatter mode="drop"). Attention isolation between packed
    documents comes from segment ids; RoPE restarts via `positions`."""
    feats = encode_images(params, cfg, images)  # (NI, T, D)
    t = feats.shape[1]
    emb = llama.embed(params["llm"], input_ids)  # (R, S, D)
    blocks = feats[img_src].astype(emb.dtype)  # (M, T, D)
    rows = jnp.broadcast_to(img_row[:, None], blocks.shape[:2])
    cols = img_col[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    emb = emb.at[rows, cols].set(blocks, mode="drop")
    hidden = llama.forward_embeds(
        params["llm"],
        cfg.llm,
        emb,
        segment_ids,
        positions,
        attn_impl=attn_impl,
        remat=remat,
        constrain=constrain,
    )
    if return_hidden:
        return hidden
    return llama.lm_logits(params["llm"], cfg.llm, hidden)


def forward(
    params: Params,
    cfg: LlavaConfig,
    input_ids: jnp.ndarray,
    images: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    signs: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    return_hidden: bool = False,
    constrain=None,
) -> Tuple[jnp.ndarray, Spliced]:
    """Full training-style forward: splice then decode stack.

    Returns (fp32 logits (B, S_out, V), spliced batch — whose labels/signs
    align with the logits for loss computation). `images` may be (B,3,H,W)
    or (B,K,3,H,W) for multi-image rows.

    return_hidden: return final hidden states (B, S_out, D) instead of
    logits — for the chunked loss path (train/dpa.py) that never
    materializes a full (B, S, V) fp32 logits tensor (V=32000 fp32 logits
    are the dominant activation at 7B scale on a 16GB chip).
    """
    if images.ndim == 5:
        b, k = images.shape[:2]
        feats = encode_images(
            params, cfg, images.reshape((b * k,) + images.shape[2:])
        )
        feats = feats.reshape((b, k) + feats.shape[1:])
        sp = splice_image_tokens_multi(
            params, cfg, input_ids, feats, segment_ids, labels, signs
        )
    else:
        feats = encode_images(params, cfg, images)
        sp = splice_image_tokens(
            params, cfg, input_ids, feats, segment_ids, labels, signs
        )
    hidden = llama.forward_embeds(
        params["llm"],
        cfg.llm,
        sp.embeds,
        sp.segment_ids,
        sp.positions,
        attn_impl=attn_impl,
        remat=remat,
        constrain=constrain,
    )
    if return_hidden:
        return hidden, sp
    logits = llama.lm_logits(params["llm"], cfg.llm, hidden)
    return logits, sp
