"""Checkpoint/resume + adapter export.

Covers the reference's save formats (SURVEY.md §5):
(a) LoRA adapter + non-lora trainables (train_halva.py:1230-1240) —
    `save_adapter`/`load_adapter` as a flat npz;
(b) full train state for resume (HF Trainer checkpoint-* dirs,
    train_halva.py:1222-1225) — orbax CheckpointManager with step
    discovery and retention;
(c) merged full model for eval (builder.py merge path) — callers run
    lora.merge_lora then `save_params`.

Under a Mesh, orbax gathers/shards transparently via the arrays' shardings.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

Params = Dict[str, Any]


class CheckpointManager:
    """Thin orbax wrapper: save/restore (trainable, opt_state, step)."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, trainable: Params, opt_state) -> None:
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                trainable=ocp.args.StandardSave(trainable),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, trainable_like: Params, opt_state_like, step: Optional[int] = None
    ) -> Tuple[Params, Any, int]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self._dir}")
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                trainable=ocp.args.StandardRestore(trainable_like),
                opt_state=ocp.args.StandardRestore(opt_state_like),
            ),
        )
        return out["trainable"], out["opt_state"], step

    def close(self):
        self._mgr.close()


def save_adapter(path: str, adapter_sd: Dict[str, np.ndarray]) -> None:
    """Flat adapter-only export (reference adapter_model.bin equivalent)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in adapter_sd.items()})


def load_adapter(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def save_params(directory: str, params: Params) -> None:
    """Full param tree (merged model) via orbax StandardCheckpointer."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), params)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(directory: str, like: Optional[Params] = None) -> Params:
    """like=None restores from the checkpoint's own metadata as HOST
    numpy arrays — ignoring the recorded device shardings twice over:
    (a) orbax stamps the saving platform's devices into the array
    metadata, so a template-free restore fails the moment the platform
    changes (save on a CPU dev box or a training pod, load on one
    serving chip: "Device TFRT_CPU_0 was not found"); (b) the eval
    loader quantizes on HOST before device_put, and a restore-to-device
    would strand the full bf16 tree in HBM (Array.delete is a no-op on
    the relay platform). Torch .bin checkpoints are device-free by
    construction (llava/model/builder.py) — orbax ones must be too."""
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(directory)
    if like is None:
        meta = ckptr.metadata(path).item_metadata.tree
        like = jax.tree.map(lambda m: np.empty(m.shape, m.dtype), meta)
    out = ckptr.restore(path, like)
    ckptr.close()
    return out
