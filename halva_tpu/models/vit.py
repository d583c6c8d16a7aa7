"""Vision transformer tower (CLIP ViT-L/14-336 and SigLIP-so400m-384).

One functional ViT covers both tower families the reference uses
(llava/model/multimodal_encoder/clip_encoder.py and
vila/model/multimodal_encoder/siglip_encoder.py) via ViTConfig flags:
CLIP = cls token + pre-layernorm + quick_gelu; SigLIP = no cls token, no
pre-LN, gelu_tanh. The tower is frozen in HALVA training, so the whole
encode runs under stop_gradient at the call site.

`hidden_states(select_layer)` reproduces the reference's feature_select
(clip_encoder.py:27-35): LLaVA-1.5 takes hidden_states[-2] and drops the
cls token ("patch" feature).

Patch embedding is a single MXU matmul (patches are unfolded host-free with
reshape/transpose) rather than a conv — identical math, better TPU mapping.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from halva_tpu.config import ViTConfig
from halva_tpu.models.llama import dense
from halva_tpu.ops.attention import attention_reference

Params = Dict[str, Any]


def layer_norm(
    x: jnp.ndarray, p: Params, eps: float
) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    out = x * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(dtype)


def _norm(cfg: ViTConfig, x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """LayerNorm (CLIP/SigLIP/RADIO) or RMSNorm (InternViT, fp32 stats —
    intern/modeling_intern_vit.py:237-248)."""
    if cfg.norm_type == "rmsnorm":
        from halva_tpu.models.llama import rms_norm

        return rms_norm(x, p["scale"], cfg.layer_norm_eps)
    return layer_norm(x, p, cfg.layer_norm_eps)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu_tanh":
        return functools.partial(jax.nn.gelu, approximate=True)
    if name == "gelu":
        return functools.partial(jax.nn.gelu, approximate=False)
    raise ValueError(f"unknown activation {name!r}")


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, num_patches, C*patch*patch), row-major patches.

    Channel-last inside each patch vector matches conv-kernel layout
    (kh, kw, in, out) flattened as (kh*kw*in) when kernel is reshaped —
    see init/convert: kernel.reshape(-1, hidden).
    """
    b, c, h, w = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # (B, gh, gw, ph, pw, C)
    return x.reshape(b, gh * gw, patch * patch * c)


def init_params(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    d = cfg.hidden_size
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    keys = jax.random.split(key, 12)

    def lin(k, i, o, bias=True):
        p = {"kernel": jax.random.normal(k, (i, o), dtype) * (i**-0.5)}
        if bias:
            p["bias"] = jnp.zeros((o,), dtype)
        return p

    def stack(init_fn, k):
        ks = jax.random.split(k, cfg.num_layers)
        return jax.vmap(init_fn)(ks)

    def ln_stack():
        if cfg.norm_type == "rmsnorm":
            return {"scale": jnp.ones((cfg.num_layers, d), dtype)}
        return {
            "scale": jnp.ones((cfg.num_layers, d), dtype),
            "bias": jnp.zeros((cfg.num_layers, d), dtype),
        }

    params: Params = {
        "patch_embed": {
            "kernel": jax.random.normal(keys[0], (cfg.patch_size, cfg.patch_size, 3, d), dtype)
            * (patch_dim**-0.5)
        },
        "pos_embed": {
            "embedding": jax.random.normal(
                keys[1], (cfg.num_positions, d), dtype
            )
            * 0.02
        },
        "layers": {
            "ln1": ln_stack(),
            "ln2": ln_stack(),
            "attn": {
                "wq": stack(lambda k: lin(k, d, d, cfg.qkv_bias), keys[2]),
                "wk": stack(lambda k: lin(k, d, d, cfg.qkv_bias), keys[3]),
                "wv": stack(lambda k: lin(k, d, d, cfg.qkv_bias), keys[4]),
                "wo": stack(lambda k: lin(k, d, d), keys[5]),
            },
            "mlp": {
                "fc1": stack(
                    lambda k: lin(k, d, cfg.intermediate_size), keys[6]
                ),
                "fc2": stack(
                    lambda k: lin(k, cfg.intermediate_size, d), keys[7]
                ),
            },
        },
        "post_ln": {
            "scale": jnp.ones((d,), dtype),
            "bias": jnp.zeros((d,), dtype),
        },
    }
    if cfg.use_cls_token:
        params["cls_token"] = {
            "embedding": jax.random.normal(keys[8], (d,), dtype) * 0.02
        }
    if cfg.num_register_tokens:
        params["register_tokens"] = {
            "embedding": jax.random.normal(
                keys[11], (cfg.num_register_tokens, d), dtype
            )
            * 0.02
        }
    if cfg.use_pre_layernorm:
        params["pre_ln"] = {
            "scale": jnp.ones((d,), dtype),
            "bias": jnp.zeros((d,), dtype),
        }
    if cfg.qk_norm:
        params["layers"]["attn"]["q_norm"] = {
            "scale": jnp.ones((cfg.num_layers, d), dtype)
        }
        params["layers"]["attn"]["k_norm"] = {
            "scale": jnp.ones((cfg.num_layers, d), dtype)
        }
    if cfg.layer_scale:
        params["layers"]["ls1"] = {
            "scale": jnp.ones((cfg.num_layers, d), dtype)
        }
        params["layers"]["ls2"] = {
            "scale": jnp.ones((cfg.num_layers, d), dtype)
        }
    return params


def _vit_layer(
    cfg: ViTConfig,
    x: jnp.ndarray,  # (B, N, D)
    p: Params,
) -> jnp.ndarray:
    b, n, d = x.shape
    h = cfg.num_heads
    dh = d // h
    act = _act(cfg.hidden_act)

    y = _norm(cfg, x, p["ln1"])
    q = dense(y, p["attn"]["wq"])
    k = dense(y, p["attn"]["wk"])
    v = dense(y, p["attn"]["wv"]).reshape(b, n, h, dh)
    if cfg.qk_norm:
        # InternViT qk_normalization: RMSNorm over the FULL embed dim
        # across heads (intern/modeling_intern_vit.py:335-338)
        from halva_tpu.models.llama import rms_norm

        q = rms_norm(q, p["attn"]["q_norm"]["scale"], cfg.layer_norm_eps)
        k = rms_norm(k, p["attn"]["k_norm"]["scale"], cfg.layer_norm_eps)
    q = q.reshape(b, n, h, dh)
    k = k.reshape(b, n, h, dh)
    attn = attention_reference(q, k, v, mask=None)  # bidirectional, no mask
    attn_out = dense(attn.reshape(b, n, d), p["attn"]["wo"])
    if cfg.layer_scale:
        attn_out = attn_out * p["ls1"]["scale"].astype(attn_out.dtype)
    x = x + attn_out

    y = _norm(cfg, x, p["ln2"])
    mlp_out = dense(act(dense(y, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    if cfg.layer_scale:
        mlp_out = mlp_out * p["ls2"]["scale"].astype(mlp_out.dtype)
    x = x + mlp_out
    return x


def encode(
    params: Params,
    cfg: ViTConfig,
    images: jnp.ndarray,  # (B, 3, H, W)
    select_layer: int = -2,
    select_feature: str = "patch",
) -> jnp.ndarray:
    """Run the tower; return the selected hidden state (B, N, D).

    select_layer indexes HF `hidden_states` (embeddings output = index 0,
    layer i output = index i+1); -2 = output of the second-to-last layer.
    select_feature "patch" drops the cls token (if the tower has one).
    """
    b = images.shape[0]
    d = cfg.hidden_size
    patches = patchify(images, cfg.patch_size)
    kernel = params["patch_embed"]["kernel"].reshape(-1, d)
    # compute in the tower's param dtype (bf16 in serving/training): fp32
    # pixel inputs would silently drag every tower matmul to fp32
    patches = patches.astype(kernel.dtype)
    # conv kernel layout is (kh, kw, in, out) but patch vectors are
    # (ph, pw, C); both flatten consistently — see patchify docstring.
    x = jnp.dot(patches, kernel)
    if "bias" in params["patch_embed"]:
        x = x + params["patch_embed"]["bias"].astype(x.dtype)

    prefix = []
    if cfg.use_cls_token:
        prefix.append(
            jnp.broadcast_to(
                params["cls_token"]["embedding"].astype(x.dtype), (b, 1, d)
            )
        )
    if cfg.num_register_tokens:
        prefix.append(
            jnp.broadcast_to(
                params["register_tokens"]["embedding"].astype(x.dtype),
                (b, cfg.num_register_tokens, d),
            )
        )
    if prefix:
        x = jnp.concatenate(prefix + [x], axis=1)
    x = x + params["pos_embed"]["embedding"].astype(x.dtype)[None]

    if cfg.use_pre_layernorm:
        x = layer_norm(x, params["pre_ln"], cfg.layer_norm_eps)

    # run layers via scan, capturing each layer's output so select_layer
    # semantics match HF output_hidden_states exactly
    num_out = cfg.num_layers + 1  # embeddings + each layer
    idx = select_layer % num_out  # e.g. -2 -> num_layers - 1
    if idx == 0:
        return _select(x, cfg, select_feature)

    # scan until idx (static), discard the rest — XLA DCEs unused layers
    layers_upto = jax.tree.map(lambda a: a[:idx], params["layers"])

    def scan_fn(carry, layer_params):
        return _vit_layer(cfg, carry, layer_params), None

    x, _ = jax.lax.scan(scan_fn, x, layers_upto)
    if idx == cfg.num_layers and "post_ln" in params and select_layer != -2:
        # HF hidden_states are pre-post_layernorm; post_ln applies only to
        # last_hidden_state, which feature_select never uses. Keep raw.
        pass
    return _select(x, cfg, select_feature)


def interpolate_pos_embed(
    params: Params, cfg: ViTConfig, new_image_size: int
) -> Tuple[Params, ViTConfig]:
    """Bicubic-resize the positional grid to a new input resolution
    (VILA VisionTower._maybe_resize_pos_embeds,
    vila/model/multimodal_encoder/vision_encoder.py:36, used by
    vision_resolution_elevation). Returns (new params, new config)."""
    import dataclasses
    import math

    old = params["pos_embed"]["embedding"]
    n_cls = 1 if cfg.use_cls_token else 0
    grid = old[n_cls:]
    side = int(math.isqrt(grid.shape[0]))
    assert side * side == grid.shape[0]
    new_side = new_image_size // cfg.patch_size
    d = grid.shape[-1]
    resized = jax.image.resize(
        grid.reshape(side, side, d).astype(jnp.float32),
        (new_side, new_side, d),
        method="bicubic",
    ).reshape(new_side * new_side, d).astype(old.dtype)
    new_embed = (
        jnp.concatenate([old[:n_cls], resized], axis=0)
        if n_cls
        else resized
    )
    new_params = dict(params)
    new_params["pos_embed"] = {"embedding": new_embed}
    new_cfg = dataclasses.replace(cfg, image_size=new_image_size)
    return new_params, new_cfg


def _select(x: jnp.ndarray, cfg: ViTConfig, feature: str) -> jnp.ndarray:
    if feature == "patch":
        n = cfg.num_prefix_tokens
        return x[:, n:] if n else x
    if feature == "cls_patch":
        return x
    raise ValueError(f"unexpected select feature {feature!r}")


def encode_radio(
    params: Params,
    cfg: ViTConfig,
    images: jnp.ndarray,  # (B, 3, H, W), UNNORMALIZED [0, 1] pixels
    pixel_unshuffle: int = 0,  # 0/1 = off; 2 = 2x2 spatial->channel fold
    skip_final_norm: bool = False,
    input_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406),
    input_std: Tuple[float, float, float] = (0.229, 0.224, 0.225),
) -> jnp.ndarray:
    """RADIO tower forward (vila/model/multimodal_encoder/radio_encoder.py).

    Semantics reproduced from the reference wrapper:
    - the processor does NOT normalize (do_normalize=False,
      radio_encoder.py:140-155); the model's input_conditioner applies
      ImageNet mean/std internally — done here;
    - features = ALL patch tokens of the FINAL layer after the model's
      final norm (get_features, :229-238); skip_layer_norm drops the norm
      (:208-210);
    - pixel_unshuffle folds a factor^2 spatial block into channels
      (:280-287), quartering the token count like VILA's mlp_downsample.
    """
    mean = jnp.asarray(input_mean, images.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(input_std, images.dtype).reshape(1, 3, 1, 1)
    images = (images - mean) / std

    x = encode(
        params, cfg, images, select_layer=-1, select_feature="cls_patch"
    )
    if not skip_final_norm:
        x = layer_norm(x, params["post_ln"], cfg.layer_norm_eps)
    x = x[:, cfg.num_prefix_tokens :]  # drop cls + register tokens

    if pixel_unshuffle and pixel_unshuffle > 1:
        f = pixel_unshuffle
        b, n, c = x.shape
        side = cfg.image_size // cfg.patch_size
        # (B, H, W, C) -> fold f x f spatial blocks into channels
        # (torch PixelUnshuffle channel order: C x fh x fw)
        g = x.reshape(b, side // f, f, side // f, f, c)
        g = g.transpose(0, 1, 3, 5, 2, 4)  # (B, H/f, W/f, C, f, f)
        x = g.reshape(b, (side // f) * (side // f), c * f * f)
    return x
