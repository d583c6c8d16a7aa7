"""HF checkpoint -> halva_tpu param-tree converters.

Weight-layout parity is hard requirement #1 (SURVEY.md §7): the DPA KL term
and all eval metrics assume fp32-logit parity with the HF models the
reference fine-tunes (llava-v1.5-7b/13b). Converters take a state_dict-like
mapping of numpy arrays (load torch .bin/safetensors host-side, convert with
`.numpy()`), and emit our stacked-layer pytree.

Conventions: HF Linear stores (out, in); we store (in, out) kernels.
Per-layer tensors are stacked on a leading num_layers axis for lax.scan.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from halva_tpu.config import LlamaConfig, ViTConfig

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def _stack(sd: Mapping[str, Any], fmt: str, n: int, transpose=False):
    arrs = []
    for i in range(n):
        a = _np(sd[fmt.format(i)])
        arrs.append(a.T if transpose else a)
    return np.stack(arrs, axis=0)


def llama_from_hf(
    sd: Mapping[str, Any], cfg: LlamaConfig, prefix: str = ""
) -> Params:
    """Convert an HF LlamaForCausalLM state_dict.

    `prefix` handles nesting (e.g. "model." already included per-key below;
    for LLaVA checkpoints the LLM weights live under the same names).
    """
    p = prefix
    n = cfg.num_layers
    params: Params = {
        "embed": {"embedding": _np(sd[f"{p}model.embed_tokens.weight"])},
        "layers": {
            "attn": {
                "wq": {
                    "kernel": _stack(
                        sd,
                        p + "model.layers.{}.self_attn.q_proj.weight",
                        n,
                        transpose=True,
                    )
                },
                "wk": {
                    "kernel": _stack(
                        sd,
                        p + "model.layers.{}.self_attn.k_proj.weight",
                        n,
                        transpose=True,
                    )
                },
                "wv": {
                    "kernel": _stack(
                        sd,
                        p + "model.layers.{}.self_attn.v_proj.weight",
                        n,
                        transpose=True,
                    )
                },
                "wo": {
                    "kernel": _stack(
                        sd,
                        p + "model.layers.{}.self_attn.o_proj.weight",
                        n,
                        transpose=True,
                    )
                },
            },
            "mlp": {
                "gate": {
                    "kernel": _stack(
                        sd,
                        p + "model.layers.{}.mlp.gate_proj.weight",
                        n,
                        transpose=True,
                    )
                },
                "up": {
                    "kernel": _stack(
                        sd,
                        p + "model.layers.{}.mlp.up_proj.weight",
                        n,
                        transpose=True,
                    )
                },
                "down": {
                    "kernel": _stack(
                        sd,
                        p + "model.layers.{}.mlp.down_proj.weight",
                        n,
                        transpose=True,
                    )
                },
            },
            "input_norm": {
                "scale": _stack(
                    sd, p + "model.layers.{}.input_layernorm.weight", n
                )
            },
            "post_attn_norm": {
                "scale": _stack(
                    sd,
                    p + "model.layers.{}.post_attention_layernorm.weight",
                    n,
                )
            },
        },
        "final_norm": {"scale": _np(sd[f"{p}model.norm.weight"])},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": _np(sd[f"{p}lm_head.weight"]).T}
    return params


def mpt_from_hf(sd: Mapping[str, Any], cfg: LlamaConfig) -> Params:
    """Convert an HF MptForCausalLM state_dict (the VILA llava_mpt
    backend's vendored model family): packed Wqkv split into wq/wk/wv,
    LayerNorm norms, non-gated ffn, tied wte head."""
    n = cfg.num_layers
    d = cfg.hidden_size

    wqkv = _stack(
        sd, "transformer.blocks.{}.attn.Wqkv.weight", n, transpose=True
    )  # (L, D, 3D)
    wq, wk, wv = (
        wqkv[:, :, :d],
        wqkv[:, :, d : 2 * d],
        wqkv[:, :, 2 * d :],
    )
    params: Params = {
        "embed": {"embedding": _np(sd["transformer.wte.weight"])},
        "layers": {
            "attn": {
                "wq": {"kernel": wq},
                "wk": {"kernel": wk},
                "wv": {"kernel": wv},
                "wo": {
                    "kernel": _stack(
                        sd,
                        "transformer.blocks.{}.attn.out_proj.weight",
                        n,
                        transpose=True,
                    )
                },
            },
            "mlp": {
                # non-gated: "gate" slot unused but kept for tree shape
                "gate": {
                    "kernel": _stack(
                        sd,
                        "transformer.blocks.{}.ffn.up_proj.weight",
                        n,
                        transpose=True,
                    )
                    * 0.0
                },
                "up": {
                    "kernel": _stack(
                        sd,
                        "transformer.blocks.{}.ffn.up_proj.weight",
                        n,
                        transpose=True,
                    )
                },
                "down": {
                    "kernel": _stack(
                        sd,
                        "transformer.blocks.{}.ffn.down_proj.weight",
                        n,
                        transpose=True,
                    )
                },
            },
            "input_norm": {
                "scale": _stack(
                    sd, "transformer.blocks.{}.norm_1.weight", n
                )
            },
            "post_attn_norm": {
                "scale": _stack(
                    sd, "transformer.blocks.{}.norm_2.weight", n
                )
            },
        },
        "final_norm": {"scale": _np(sd["transformer.norm_f.weight"])},
    }
    return params


def clip_vit_from_hf(
    sd: Mapping[str, Any], cfg: ViTConfig, prefix: str = "vision_model."
) -> Params:
    """Convert an HF CLIPVisionModel state_dict to our ViT tree."""
    p = prefix
    n = cfg.num_layers

    def ln(fmt):
        return {
            "scale": _stack(sd, fmt + ".weight", n),
            "bias": _stack(sd, fmt + ".bias", n),
        }

    def lin(fmt):
        return {
            "kernel": _stack(sd, fmt + ".weight", n, transpose=True),
            "bias": _stack(sd, fmt + ".bias", n),
        }

    enc = p + "encoder.layers.{}."
    params: Params = {
        "patch_embed": {
            # HF conv (out, in, kh, kw) -> (kh, kw, in, out)
            "kernel": _np(
                sd[p + "embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0),
            # CLIP conv has no bias; SigLIP does
            **(
                {"bias": _np(sd[p + "embeddings.patch_embedding.bias"])}
                if p + "embeddings.patch_embedding.bias" in sd
                else {}
            ),
        },
        "pos_embed": {
            "embedding": _np(sd[p + "embeddings.position_embedding.weight"])
        },
        "layers": {
            "ln1": ln(enc + "layer_norm1"),
            "ln2": ln(enc + "layer_norm2"),
            "attn": {
                "wq": lin(enc + "self_attn.q_proj"),
                "wk": lin(enc + "self_attn.k_proj"),
                "wv": lin(enc + "self_attn.v_proj"),
                "wo": lin(enc + "self_attn.out_proj"),
            },
            "mlp": {
                "fc1": lin(enc + "mlp.fc1"),
                "fc2": lin(enc + "mlp.fc2"),
            },
        },
    }
    if cfg.use_cls_token:
        params["cls_token"] = {
            "embedding": _np(sd[p + "embeddings.class_embedding"])
        }
    if cfg.use_pre_layernorm:
        params["pre_ln"] = {
            "scale": _np(sd[p + "pre_layrnorm.weight"]),
            "bias": _np(sd[p + "pre_layrnorm.bias"]),
        }
    # post layernorm exists in both CLIP and SigLIP
    if p + "post_layernorm.weight" in sd:
        params["post_ln"] = {
            "scale": _np(sd[p + "post_layernorm.weight"]),
            "bias": _np(sd[p + "post_layernorm.bias"]),
        }
    return params


def intern_vit_from_hf(
    sd: Mapping[str, Any], cfg: ViTConfig, prefix: str = ""
) -> Params:
    """Convert an InternVisionModel state_dict (the reference's vendored
    vila/model/multimodal_encoder/intern/modeling_intern_vit.py) to our
    ViT tree: fused qkv is split into wq/wk/wv; RMSNorm weights map to
    scale-only norm dicts; ls1/ls2 are the LayerScale vectors."""
    p = prefix
    n = cfg.num_layers
    d = cfg.hidden_size
    enc = p + "encoder.layers.{}."

    qkv_w = _stack(sd, enc + "attn.qkv.weight", n)  # (L, 3D, D)
    has_qkv_bias = (enc + "attn.qkv.bias").format(0) in sd
    if has_qkv_bias:
        qkv_b = _stack(sd, enc + "attn.qkv.bias", n)  # (L, 3D)

    def split_qkv(i):
        w = qkv_w[:, i * d : (i + 1) * d, :].transpose(0, 2, 1)
        out = {"kernel": w}
        if has_qkv_bias:
            out["bias"] = qkv_b[:, i * d : (i + 1) * d]
        return out

    def rms(fmt):
        return {"scale": _stack(sd, fmt + ".weight", n)}

    def lin(fmt):
        return {
            "kernel": _stack(sd, fmt + ".weight", n, transpose=True),
            "bias": _stack(sd, fmt + ".bias", n),
        }

    params: Params = {
        "patch_embed": {
            "kernel": _np(
                sd[p + "embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": _np(sd[p + "embeddings.patch_embedding.bias"]),
        },
        "pos_embed": {
            # stored (1, P+1, D)
            "embedding": _np(sd[p + "embeddings.position_embedding"])[0]
        },
        "cls_token": {
            "embedding": _np(sd[p + "embeddings.class_embedding"]).reshape(
                -1
            )
        },
        "layers": {
            "ln1": rms(enc + "norm1"),
            "ln2": rms(enc + "norm2"),
            "ls1": {"scale": _stack(sd, enc + "ls1", n)},
            "ls2": {"scale": _stack(sd, enc + "ls2", n)},
            "attn": {
                "wq": split_qkv(0),
                "wk": split_qkv(1),
                "wv": split_qkv(2),
                "wo": lin(enc + "attn.proj"),
                "q_norm": rms(enc + "attn.q_norm"),
                "k_norm": rms(enc + "attn.k_norm"),
            },
            "mlp": {
                "fc1": lin(enc + "mlp.fc1"),
                "fc2": lin(enc + "mlp.fc2"),
            },
        },
    }
    return params


def projector_from_hf(
    sd: Mapping[str, Any],
    projector_type: str,
    prefix: str = "model.mm_projector.",
) -> Params:
    """Convert LLaVA mm_projector weights (nn.Sequential numbering)."""
    if projector_type == "linear":
        return {
            "layers": [
                {
                    "kernel": _np(sd[prefix + "weight"]).T,
                    "bias": _np(sd[prefix + "bias"]),
                }
            ]
        }
    # mlpNx_gelu: Sequential indices 0, 2, 4, ... are Linears
    layers = []
    i = 0
    while f"{prefix}{i}.weight" in sd:
        layers.append(
            {
                "kernel": _np(sd[f"{prefix}{i}.weight"]).T,
                "bias": _np(sd[f"{prefix}{i}.bias"]),
            }
        )
        i += 2
    if not layers:
        raise KeyError(f"no projector weights under {prefix!r}")
    return {"layers": layers}


def cast_tree(params: Params, dtype) -> Params:
    import jax

    return jax.tree.map(lambda x: x.astype(dtype), params)
