"""Model loading for training/eval: HF checkpoints, adapters, merging.

Replaces the reference eval builder (llava/model/builder.py:11-109):
  base model -> non_lora_trainables -> PEFT adapter -> merge_and_unload
with pure tree ops over our param format. Two sources are supported:

- HF-format LLaVA checkpoint dirs (pytorch_model*.bin / *.safetensors,
  the released liuhaotian/llava-v1.5-* and pritamqu/halva*-lora layouts),
  converted through models/convert_hf.py;
- native orbax dirs written by halva_tpu.train.checkpoint.save_params.

PEFT adapter weights (adapter_model.bin with base_model.model.* keys,
lora_A/lora_B) are translated into our lora_a/lora_b factors so released
HALVA adapters load directly.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from halva_tpu.config import (
    CLIP_VIT_L_336,
    LLAVA_V15_13B,
    LLAVA_V15_7B,
    LlavaConfig,
)
from halva_tpu.models import convert_hf, llava
from halva_tpu.train import lora as lora_lib

Params = Dict[str, Any]


def load_hf_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all weight shards in an HF checkpoint dir into one flat dict
    of numpy arrays (host RAM; 7B fp16 ~= 13GB — fine on this host)."""
    sd: Dict[str, np.ndarray] = {}
    sts = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    bins = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    if sts:
        from safetensors.numpy import load_file

        for p in sts:
            sd.update(load_file(p))
    elif bins:
        import torch

        for p in bins:
            shard = torch.load(p, map_location="cpu", weights_only=True)
            for k, v in shard.items():
                sd[k] = v.float().numpy()
    else:
        raise FileNotFoundError(f"no weight shards in {model_dir}")
    return sd


def config_from_hf(model_dir: str) -> LlavaConfig:
    import dataclasses

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    cfg = LLAVA_V15_13B if hf.get("hidden_size") == 5120 else LLAVA_V15_7B
    return dataclasses.replace(
        cfg,
        mm_use_im_start_end=bool(hf.get("mm_use_im_start_end", False)),
        mm_use_im_patch_token=bool(hf.get("mm_use_im_patch_token", False)),
    )


def llava_params_from_hf(
    sd: Dict[str, np.ndarray], cfg: LlavaConfig
) -> Params:
    """Full LLaVA checkpoint (LLM + vision tower + projector) -> tree.

    The released llava-v1.5 checkpoints store the CLIP tower under
    model.vision_tower.vision_tower.vision_model.*; some exports omit it
    (tower loaded from the CLIP repo) — in that case the vision entry is
    initialized empty and must be filled via `attach_vision_tower`.
    """
    params: Params = {
        "llm": convert_hf.llama_from_hf(sd, cfg.llm),
        "projector": convert_hf.projector_from_hf(
            sd, cfg.mm_projector_type
        ),
    }
    tower_prefix = "model.vision_tower.vision_tower.vision_model."
    if any(k.startswith(tower_prefix) for k in sd):
        params["vision"] = convert_hf.clip_vit_from_hf(
            sd, cfg.vision, prefix=tower_prefix
        )
    return params


def attach_vision_tower(
    params: Params, tower_dir: str, cfg: LlavaConfig
) -> Params:
    """Load a standalone CLIP/SigLIP tower checkpoint dir (HF format)."""
    sd = load_hf_state_dict(tower_dir)
    params = dict(params)
    params["vision"] = convert_hf.clip_vit_from_hf(
        sd, cfg.vision, prefix="vision_model."
    )
    return params


# ---- PEFT adapter translation --------------------------------------------

_PEFT_NAME_MAP = {
    "q_proj": ("attn", "wq"),
    "k_proj": ("attn", "wk"),
    "v_proj": ("attn", "wv"),
    "o_proj": ("attn", "wo"),
    "gate_proj": ("mlp", "gate"),
    "up_proj": ("mlp", "up"),
    "down_proj": ("mlp", "down"),
}

_PEFT_KEY_RE = re.compile(
    r"model\.layers\.(\d+)\.(self_attn|mlp)\.(\w+)\.lora_([AB])\.weight$"
)


def peft_adapter_to_lora(
    adapter_sd: Dict[str, np.ndarray],
    num_layers: int,
    lora_alpha: float,
    lora_r: int,
) -> Dict[str, Dict[str, np.ndarray]]:
    """PEFT adapter_model dict -> {module_path: {lora_a, lora_b, scale}}
    with per-layer stacking. PEFT stores lora_A (r, in) and lora_B
    (out, r); ours are (in, r) and (r, out)."""
    per_module: Dict[Tuple[str, str], Dict[str, Dict[int, np.ndarray]]] = {}
    for key, val in adapter_sd.items():
        m = _PEFT_KEY_RE.search(key)
        if not m:
            continue
        layer, _, proj, ab = m.groups()
        if proj not in _PEFT_NAME_MAP:
            continue
        group, name = _PEFT_NAME_MAP[proj]
        slot = per_module.setdefault(
            (group, name), {"A": {}, "B": {}}
        )
        slot[ab][int(layer)] = np.asarray(val, np.float32)

    out: Dict[str, Dict[str, np.ndarray]] = {}
    scale = np.asarray(lora_alpha / lora_r, np.float32)
    for (group, name), slot in per_module.items():
        a = np.stack(
            [slot["A"][i].T for i in range(num_layers)], axis=0
        )  # (L, in, r)
        b = np.stack(
            [slot["B"][i].T for i in range(num_layers)], axis=0
        )  # (L, r, out)
        out[f"layers/{group}/{name}"] = {
            "lora_a": a,
            "lora_b": b,
            "lora_scale": np.full((num_layers,), scale, np.float32),
        }
    return out


def apply_peft_adapter(
    params: Params, adapter_dir: str, cfg: LlavaConfig
) -> Params:
    """Load PEFT adapter_model.bin + adapter_config.json into the tree."""
    with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
        acfg = json.load(f)
    bin_path = os.path.join(adapter_dir, "adapter_model.bin")
    st_path = os.path.join(adapter_dir, "adapter_model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    else:
        import torch

        sd = {
            k: v.float().numpy()
            for k, v in torch.load(
                bin_path, map_location="cpu", weights_only=True
            ).items()
        }
    modules = peft_adapter_to_lora(
        sd, cfg.llm.num_layers, acfg["lora_alpha"], acfg["r"]
    )
    params = jax.tree.map(lambda x: x, params)
    llm = params["llm"]
    for path, factors in modules.items():
        node = llm
        for part in path.split("/")[:-1]:
            node = node[part]
        node = node[path.split("/")[-1]]
        node.update(
            {k: jnp.asarray(v) for k, v in factors.items()}
        )
    return params


def apply_non_lora_trainables(
    params: Params, sd: Dict[str, np.ndarray], cfg: LlavaConfig
) -> Params:
    """non_lora_trainables.bin: extra full weights trained alongside LoRA
    (reference builder.py:50-65) — typically mm_projector and/or embeds."""
    params = jax.tree.map(lambda x: x, params)
    proj_keys = {
        k: v for k, v in sd.items() if "mm_projector" in k
    }
    if proj_keys:
        # normalize "base_model.model.model.mm_projector.0.weight" etc.
        norm = {}
        for k, v in proj_keys.items():
            idx = k.index("mm_projector")
            norm["model." + k[idx:]] = v
        params["projector"] = convert_hf.projector_from_hf(
            norm, cfg.mm_projector_type
        )
    return params


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    dtype=jnp.bfloat16,
    vision_tower_path: Optional[str] = None,
    quant: str = "none",  # none | int8 | int4 | int4g (host-side)
    tokenizer=None,
    quant_tp: int = 1,  # int4 packing tp (manual-TP mesh model axis)
) -> Tuple[Params, LlavaConfig]:
    """The reference's eval loader contract (builder.py:11):

    - model_path is a per-component dir (llm/ vision_tower/
      mm_projector/ + config.json, written by train with
      save_component_dirs=True): reconstruct config from the saved
      metadata and load each component — the VILA eval-loader contract
      (vila/model/builder_halva.py:39, prepare_config_for_eval:260)
      with no `like=` template needed.
    - model_base given (LoRA checkpoint): load base, apply
      non_lora_trainables + PEFT adapter (or our adapter.npz), merge.
    - else: plain full checkpoint.

    With `tokenizer` given, checkpoints whose config records
    mm_use_im_start_end / mm_use_im_patch_token get the reference eval
    loader's token re-add + mean-init embedding resize
    (llava/model/builder.py:89-96 -> models/vocab.py), BEFORE any
    quantization.

    Quantized loads are disk-cached (utils/treecache.py, keyed by the
    checkpoint files + quant config; HALVA_QUANT_CACHE=off disables):
    the host pipeline above costs ~17 min at 7B on this platform, a
    warm load is np.load + device_put.
    """
    from halva_tpu.train import vila as vila_lib

    def put_leaf(x):
        # int8 payloads, bf16 scales, and integer metadata (the
        # w4_pack_tp stamp) keep their dtype; floats go to `dtype`
        if x.dtype in (np.int8, np.int32, jnp.bfloat16):
            return jnp.asarray(x)
        return jnp.asarray(x, dtype)

    def fence_tree(p):
        # jnp.asarray is async and block_until_ready is a NO-OP on the
        # relay platform. Fencing evolution (EVAL_REAL_v2 vs _v3):
        # per-leaf readbacks cost ~a relay RTT each (~90 s at a 7B
        # tree's leaf count); a stacked canary over every leaf was
        # WORSE (each eager slice op pays a tiny relay compile —
        # +25 s). v3 also showed the transfers are effectively SERIAL
        # on this relay (stream-overlapped load ~= the serial phases:
        # ~23 MB/s infra floor), so one readback of the last leaf is
        # an adequate fence for attribution; the first batch
        # data-depends on every leaf and absorbs any residue.
        if not os.environ.get("HALVA_PHASE_JSON"):
            return
        leaves = jax.tree.leaves(p)
        if leaves:
            np.asarray(leaves[-1].ravel()[0])

    def to_device(p):
        out = jax.tree.map(put_leaf, p)
        fence_tree(out)
        return out

    from halva_tpu.utils.phases import phase

    cache_path = None
    if quant in ("int8", "int4", "int4g"):
        from halva_tpu.utils import treecache

        cdir = treecache.cache_dir()
        if cdir is not None:
            key = treecache.cache_key(
                quant,
                quant_tp,
                dtype,
                [model_path, model_base, vision_tower_path],
                extra={
                    "tok_len": len(tokenizer) if tokenizer is not None else None
                },
            )
            cache_path = os.path.join(cdir, f"qtree_{key}.npz")
            if os.path.exists(cache_path):
                # streaming warm start: each leaf's async host->device
                # transfer is enqueued right after its npz entry is
                # read, so disk IO and relay transfer overlap; one
                # canary readback fences the lot (treecache.load_tree)
                with phase("qtree_stream_to_device"):
                    params, cfg = treecache.load_tree(
                        cache_path, put=put_leaf
                    )
                    fence_tree(params)
                return params, cfg

    if vila_lib.is_component_checkpoint(model_path):
        cfg = vila_lib.load_component_config(model_path)
        with phase("checkpoint_load"):
            params = vila_lib.load_components(model_path)
        # training saves UNMERGED LoRA factors; eval merges them
        # (merge_and_unload semantics) — the fused w4 decode path reads
        # kernels only, so unmerged adapters would be silently dropped
        params = lora_lib.merge_lora(params)
    elif model_base is not None:
        cfg = config_from_hf(model_base)
        params = llava_params_from_hf(load_hf_state_dict(model_base), cfg)
        nlt = os.path.join(model_path, "non_lora_trainables.bin")
        if os.path.exists(nlt):
            import torch

            sd = {
                k: v.float().numpy()
                for k, v in torch.load(
                    nlt, map_location="cpu", weights_only=True
                ).items()
            }
            params = apply_non_lora_trainables(params, sd, cfg)
        ours = os.path.join(model_path, "adapter.npz")
        if os.path.exists(ours):
            from halva_tpu.train.checkpoint import load_adapter

            base_with_slots = lora_lib.add_lora(
                params, jax.random.PRNGKey(0), rank=1, alpha=1.0
            )
            params = lora_lib.load_lora_state_dict(
                base_with_slots, load_adapter(ours)
            )
        else:
            params = apply_peft_adapter(params, model_path, cfg)
        params = lora_lib.merge_lora(params)
    else:
        cfg = config_from_hf(model_path)
        params = llava_params_from_hf(
            load_hf_state_dict(model_path), cfg
        )
    if "vision" not in params:
        if vision_tower_path is None:
            raise FileNotFoundError(
                "checkpoint has no vision tower; pass vision_tower_path"
            )
        params = attach_vision_tower(params, vision_tower_path, cfg)
    if tokenizer is not None and (
        cfg.mm_use_im_start_end or cfg.mm_use_im_patch_token
    ):
        from halva_tpu.models.vocab import extend_tokenizer_and_embeddings

        params, cfg, _ = extend_tokenizer_and_embeddings(
            params,
            cfg,
            tokenizer,
            mm_use_im_patch_token=cfg.mm_use_im_patch_token,
            mm_use_im_start_end=cfg.mm_use_im_start_end,
        )
    if quant in ("int8", "int4", "int4g"):
        # quantize on HOST before any device transfer (the device cannot
        # hold bf16 + int8 trees at once; see quantize_params_host note).
        # int4 = the bench.py headline serving config: stacked layer
        # kernels packed int4 (ops/w4_matmul), embeds/2D kernels int8.
        # int4g = int4 with sub-channel (128-row group) scales — same
        # storage + kernels, ~2/3 the quantization error.
        if quant in ("int4", "int4g"):
            from halva_tpu.ops.w4_matmul import quantize_params_int4_host
            from halva_tpu.parallel.partition import manual_tp_ready

            # quant_tp > 1: shard-consistent nibble packing so the
            # manual shard_map TP route keeps the fused kernels — but
            # only when the pre-quant tree/config actually qualify for
            # that route (indivisible heads / ALiBi / wo-down biases
            # fall back to propagation, which needs PLAIN packing: a
            # tp-packed tree is block-permuted for global consumers)
            eff_tp = quant_tp
            if eff_tp > 1 and not manual_tp_ready(params, cfg, eff_tp):
                eff_tp = 1
            with phase("host_quantize"):
                params = quantize_params_int4_host(
                    params,
                    group_size=128 if quant == "int4g" else None,
                    tp=eff_tp,
                )
        else:
            from halva_tpu.ops.quant import quantize_params_host

            with phase("host_quantize"):
                params = quantize_params_host(params)
        if cache_path is not None:
            from halva_tpu.utils import treecache

            with phase("qtree_cache_npz_save"):
                treecache.save_tree(cache_path, params, cfg)
        with phase("device_put"):
            params = to_device(params)
    else:
        with phase("device_put"):
            params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    return params, cfg
