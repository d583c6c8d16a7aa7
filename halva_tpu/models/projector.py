"""Multimodal projector: vision features -> LLM embedding space.

Covers every projector type the reference ships:
- LLaVA builder (llava/model/multimodal_projector/builder.py:33-51):
  linear, mlpNx_gelu, identity.
- VILA base_projector (vila/model/multimodal_projector/base_projector.py):
  mlp_downsample — a 2x2 spatial fold into channels (4x token reduction)
  followed by a gelu MLP.

Params: {"layers": [dense_params, ...]} applied with GELU between layers.
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from halva_tpu.config import LlavaConfig
from halva_tpu.models.llama import dense

Params = Dict[str, Any]


def _num_linears(projector_type: str) -> int:
    if projector_type == "identity":
        return 0
    if projector_type == "linear":
        return 1
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        return int(m.group(1))
    if projector_type == "mlp_downsample":
        return 2
    raise ValueError(f"unknown projector type: {projector_type!r}")


def init_params(
    key: jax.Array, cfg: LlavaConfig, dtype=jnp.float32
) -> Params:
    n = _num_linears(cfg.mm_projector_type)
    in_dim = cfg.vision_feature_size  # tower dim (x unshuffle^2 for RADIO)
    if cfg.mm_projector_type == "mlp_downsample":
        in_dim *= cfg.downsample_factor**2
    out_dim = cfg.llm.hidden_size
    layers: List[Params] = []
    keys = jax.random.split(key, max(n, 1))
    for i in range(n):
        d_in = in_dim if i == 0 else out_dim
        layers.append(
            {
                "kernel": jax.random.normal(keys[i], (d_in, out_dim), dtype)
                * (d_in**-0.5),
                "bias": jnp.zeros((out_dim,), dtype),
            }
        )
    return {"layers": layers}


def downsample_2x2(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, N, D) -> (B, N/f^2, D*f^2): fold f x f spatial patch blocks into
    channels (VILA DownSampleBlock)."""
    b, n, d = x.shape
    side = int(math.isqrt(n))
    assert side * side == n, f"non-square token grid: {n}"
    x = x.reshape(b, side, side, d)
    x = x.reshape(b, side // factor, factor, side // factor, factor, d)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (side // factor) ** 2, factor * factor * d)


def apply(
    params: Params, cfg: LlavaConfig, features: jnp.ndarray
) -> jnp.ndarray:
    """(B, N, mm_hidden) -> (B, N', llm_hidden)."""
    x = features
    if cfg.mm_projector_type == "identity":
        return x
    if cfg.mm_projector_type == "mlp_downsample":
        x = downsample_2x2(x, cfg.downsample_factor)
    layers = params["layers"]
    for i, p in enumerate(layers):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)
        x = dense(x, p)
    return x
