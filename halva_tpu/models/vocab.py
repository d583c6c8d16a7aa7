"""Tokenizer vocab extension with mean-init embedding resize.

Reference behavior contracts:
- `initialize_vision_tokenizer` (llava/model/llava_arch.py:398-440):
  adds <im_patch> (mm_use_im_patch_token) and <im_start>/<im_end>
  (mm_use_im_start_end) as special tokens, resizes input + output
  embeddings, and initializes every NEW row to the MEAN of the old rows.
- `smart_tokenizer_and_embedding_resize` (llava/train/train_halva.py:
  211-233): same mean-init resize for arbitrary special-token dicts
  (e.g. an added pad token).
- Eval side (llava/model/builder.py:89-96): the loader re-adds the
  tokens recorded in the model config and resizes before generation.

Here params are plain pytrees, so the resize is a pure tree op on
`params["llm"]`: embed.embedding (V, D) gains rows, lm_head.kernel
(D, V) gains columns; both mean-initialized. The host-side numpy mean
is computed in float32 regardless of param dtype (matches torch's
.data.mean on fp32/bf16 master weights closely enough — parity test
tests/test_vocab_extend.py checks against the torch reference math).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np

import jax.numpy as jnp

from halva_tpu.config import LlavaConfig
from halva_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
)

Params = Dict[str, Any]


def _mean_extend_rows(table: np.ndarray, num_new: int) -> np.ndarray:
    """(V, D) -> (V + num_new, D); new rows = mean of old rows
    (llava_arch.py:407-416 input_embeddings_avg)."""
    avg = table.astype(np.float32).mean(axis=0, keepdims=True)
    new = np.broadcast_to(avg, (num_new, table.shape[1]))
    return np.concatenate([table, new.astype(table.dtype)], axis=0)


def extend_embeddings(
    llm_params: Params, num_new: int
) -> Params:
    """Grow embed table rows and lm_head columns by num_new mean-init
    entries. Quantized tables are not supported — extend BEFORE
    quantization (models/builder.py orders it that way)."""
    if num_new <= 0:
        return llm_params
    out = dict(llm_params)
    ep = dict(llm_params["embed"])
    if "embedding" not in ep:
        raise ValueError(
            "vocab extension requires an unquantized embed table; "
            "extend before int8/int4 conversion"
        )
    emb = np.asarray(ep["embedding"])
    ep["embedding"] = jnp.asarray(_mean_extend_rows(emb, num_new))
    out["embed"] = ep
    if "lm_head" in llm_params:
        hp = dict(llm_params["lm_head"])
        if "kernel" not in hp:
            raise ValueError(
                "vocab extension requires an unquantized lm_head"
            )
        k = np.asarray(hp["kernel"])  # (D, V)
        hp["kernel"] = jnp.asarray(
            _mean_extend_rows(k.T, num_new).T.copy()
        )
        out["lm_head"] = hp
    return out


def extend_tokenizer_and_embeddings(
    params: Params,
    cfg: LlavaConfig,
    tokenizer,
    mm_use_im_patch_token: bool = False,
    mm_use_im_start_end: bool = False,
    extra_special_tokens: Dict[str, str] | None = None,
) -> Tuple[Params, LlavaConfig, int]:
    """The reference's initialize_vision_tokenizer +
    smart_tokenizer_and_embedding_resize in one pure call.

    Mutates `tokenizer` (adds special tokens), returns (new params tree,
    new LlavaConfig with grown llm.vocab_size, num_new_tokens). Safe to
    call when the tokens already exist (num_new == 0 -> no-op)."""
    num_new = 0
    if extra_special_tokens:
        num_new += tokenizer.add_special_tokens(dict(extra_special_tokens))
    if mm_use_im_patch_token:
        num_new += tokenizer.add_tokens(
            [DEFAULT_IMAGE_PATCH_TOKEN], special_tokens=True
        )
    if mm_use_im_start_end:
        num_new += tokenizer.add_tokens(
            [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN],
            special_tokens=True,
        )
    if num_new == 0:
        return params, cfg, 0
    new_vocab = len(tokenizer)
    grow = new_vocab - cfg.llm.vocab_size
    if grow <= 0:
        return params, cfg, 0
    out = dict(params)
    out["llm"] = extend_embeddings(params["llm"], grow)
    new_cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, vocab_size=new_vocab)
    )
    return out, new_cfg, grow
