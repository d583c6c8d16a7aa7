"""LoRA as a param-tree transform (replaces PEFT).

The reference wraps the model with peft.get_peft_model targeting every LLM
linear except lm_head/mm_projector/vision_tower (llava/train/
train_halva.py:156-169, 1085-1101; r=128, alpha=256 per src/hallava_7b.sh).
Here LoRA is data, not a wrapper: `add_lora` inserts lora_a/lora_b/
lora_scale into the matched dense param dicts and halva_tpu.models.llama
.dense applies them; `merge_lora` folds A@B into the kernel (the
reference's merge_and_unload, llava/model/builder.py:67-71) as a pure tree
op; `trainable_mask` yields the bool tree the optimizer masks with.

Init matches LoRA convention: A ~ kaiming-uniform, B = 0 (adapter starts
as identity).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# dense-param dicts whose path matches get adapters; mirrors
# find_all_linear_names: all LLM linears except lm_head (and the embed
# table, which is not a linear).
DEFAULT_TARGETS = (
    r"llm/layers/attn/w[qkvo]$",
    r"llm/layers/mlp/(gate|up|down)$",
)
# bare-LLM trees (no "llm/" prefix)
LLM_TARGETS = (
    r"^layers/attn/w[qkvo]$",
    r"^layers/mlp/(gate|up|down)$",
)


def _iter_dense(params: Params, prefix: str = ""):
    """Yield (path, dense_param_dict) for every dict holding a 'kernel'
    (bf16/fp32), 'kernel_q' (int8), 'kernel_q4' (NF4) or 'kernel_q4p'
    (packed symmetric int4) — the quantized ones are QLoRA-class bases."""
    if isinstance(params, dict):
        if (
            "kernel" in params
            or "kernel_q" in params
            or "kernel_q4" in params
            or "kernel_q4p" in params
        ):
            yield prefix.rstrip("/"), params
            return
        for k, v in params.items():
            yield from _iter_dense(v, f"{prefix}{k}/")
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            yield from _iter_dense(v, f"{prefix}{i}/")


def add_lora(
    params: Params,
    key: jax.Array,
    rank: int = 128,
    alpha: float = 256.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=None,
) -> Params:
    """Return a copy of `params` with LoRA factors on matched denses.

    Kernels may be stacked (L, in, out) — factors get the same leading dim.
    """
    params = jax.tree.map(lambda x: x, params)  # shallow-ish copy via rebuild
    matched = 0
    for path, p in _iter_dense(params):
        if not any(re.search(t, path) for t in targets):
            continue
        kern = p.get(
            "kernel",
            p.get("kernel_q", p.get("kernel_q4", p.get("kernel_q4p"))),
        )
        # int8/int4/NF4 base (QLoRA-class, train_halva.py:1036-1052):
        # adapters train in bf16 on top of the frozen quantized kernel
        dt = dtype or (
            jnp.bfloat16
            if kern.dtype in (jnp.int8, jnp.uint4)
            else kern.dtype
        )
        *lead, d_in, d_out = kern.shape
        if "kernel_q4p" in p:
            d_out *= 2  # packed int4: two output nibbles per int8 byte
        key, k1 = jax.random.split(key)
        # kaiming-uniform bound for A (fan_in = d_in)
        bound = float(np.sqrt(3.0) / np.sqrt(d_in))
        p["lora_a"] = jax.random.uniform(
            k1, (*lead, d_in, rank), dt, minval=-bound, maxval=bound
        )
        p["lora_b"] = jnp.zeros((*lead, rank, d_out), dt)
        # leading dims match the stacked-layer kernel so lax.scan can
        # slice every leaf uniformly
        p["lora_scale"] = jnp.full(tuple(lead), alpha / rank, dt)
        matched += 1
    if matched == 0:
        raise ValueError(f"no dense params matched LoRA targets {targets}")
    return params


def merge_lora(params: Params) -> Params:
    """Fold adapters into kernels and strip the factors (merge_and_unload)."""
    params = jax.tree.map(lambda x: x, params)
    for _, p in _iter_dense(params):
        if "lora_a" in p:
            a = p["lora_a"].astype(jnp.float32)
            b = p["lora_b"].astype(jnp.float32)
            scale = p["lora_scale"].astype(jnp.float32)
            scale = scale.reshape(scale.shape + (1, 1))
            delta = jnp.einsum("...ir,...ro->...io", a, b) * scale
            p["kernel"] = (
                p["kernel"].astype(jnp.float32) + delta
            ).astype(p["kernel"].dtype)
            del p["lora_a"], p["lora_b"], p["lora_scale"]
    return params


def strip_lora(params: Params) -> Params:
    """Remove adapters without merging (recover the frozen base)."""
    params = jax.tree.map(lambda x: x, params)
    for _, p in _iter_dense(params):
        for k in ("lora_a", "lora_b", "lora_scale"):
            p.pop(k, None)
    return params


def trainable_mask(
    params: Params, extra_trainable: Sequence[str] = ()
) -> Params:
    """Bool tree: True = trained. LoRA A/B only (scale stays fixed), plus
    any path matching `extra_trainable` regexes (e.g. "projector/" when
    mm_projector_lr > 0)."""
    flat = jax.tree_util.tree_flatten_with_path(params)

    def mask(kp, _):
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
        path = "/".join(parts)
        leafname = parts[-1] if parts else ""
        if leafname in ("lora_a", "lora_b"):
            return True
        if leafname == "lora_scale":
            return False
        return any(re.search(t, path) for t in extra_trainable)

    leaves = [mask(kp, leaf) for kp, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def lora_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Adapter-only flat dict for checkpointing (the reference's
    adapter_model.bin equivalent, train_halva.py:1230-1240)."""
    out = {}
    for path, p in _iter_dense(params):
        for k in ("lora_a", "lora_b", "lora_scale"):
            if k in p:
                out[f"{path}/{k}"] = np.asarray(p[k])
    return out


def load_lora_state_dict(params: Params, sd: Dict[str, np.ndarray]) -> Params:
    params = jax.tree.map(lambda x: x, params)
    seen = set()
    for path, p in _iter_dense(params):
        for k in ("lora_a", "lora_b", "lora_scale"):
            full = f"{path}/{k}"
            if full in sd:
                p[k] = jnp.asarray(sd[full])
                seen.add(full)
    missing = set(sd) - seen
    if missing:
        raise KeyError(f"unmatched adapter weights: {sorted(missing)[:5]}")
    return params
