"""S2 multiscale vision encoding (Scaling-on-Scales).

Reimplements the capability of VILA's VisionTowerS2
(vila/model/multimodal_encoder/vision_encoder.py:160, which wraps the
external s2wrapper package): the image is encoded at several scales, the
larger scales are split into base-size tiles, each tile goes through the
same frozen tower, tile grids are stitched and area-pooled back to the
base token grid, and per-scale features concatenate on the channel axis.
Output: (B, base_tokens, D * num_scales) — the projector input width
scales accordingly.

Everything is static-shape: scales and tile counts are config constants,
so the whole multiscale sweep is one batched tower call.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from halva_tpu.config import ViTConfig
from halva_tpu.models import vit

Params = Dict[str, Any]


def _resize_images(
    images: jnp.ndarray, size: int
) -> jnp.ndarray:  # (B, 3, H, W) -> (B, 3, size, size)
    b, c = images.shape[:2]
    return jax.image.resize(
        images.astype(jnp.float32),
        (b, c, size, size),
        method="bilinear",
    ).astype(images.dtype)


def _split_tiles(images: jnp.ndarray, base: int) -> jnp.ndarray:
    """(B, 3, g*base, g*base) -> (B*g*g, 3, base, base), row-major."""
    b, c, h, w = images.shape
    g = h // base
    x = images.reshape(b, c, g, base, g, base)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, g, g, C, base, base)
    return x.reshape(b * g * g, c, base, base)


def _stitch_and_pool(
    feats: jnp.ndarray,  # (B*g*g, n_patches, D)
    batch: int,
    grid: int,  # tiles per side (g)
    side: int,  # patch tokens per tile side
) -> jnp.ndarray:
    """Stitch tile token grids into one big grid and average-pool back to
    the base (side x side) token grid. Returns (B, side*side, D)."""
    d = feats.shape[-1]
    x = feats.reshape(batch, grid, grid, side, side, d)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, g, side, g, side, D)
    big = grid * side
    x = x.reshape(batch, big, big, d)
    # area pooling: factor-g average over non-overlapping windows
    x = x.reshape(batch, side, grid, side, grid, d).mean(axis=(2, 4))
    return x.reshape(batch, side * side, d)


def encode_multiscale(
    params: Params,
    cfg: ViTConfig,
    images: jnp.ndarray,  # (B, 3, H, W) at any resolution
    scales: Sequence[int] = (336, 672),
    select_layer: int = -2,
    select_feature: str = "patch",
) -> jnp.ndarray:
    """(B, base_tokens, D * len(scales))."""
    base = cfg.image_size
    assert all(s % base == 0 for s in scales), (scales, base)
    b = images.shape[0]
    side = base // cfg.patch_size

    outs = []
    for s in scales:
        resized = _resize_images(images, s)
        g = s // base
        tiles = _split_tiles(resized, base)  # (B*g*g, 3, base, base)
        feats = vit.encode(
            params, cfg, tiles,
            select_layer=select_layer, select_feature=select_feature,
        )  # (B*g*g, side*side, D)
        outs.append(_stitch_and_pool(feats, b, g, side))
    return jnp.concatenate(outs, axis=-1)
