"""Host-side quantized param-tree disk cache.

Serving startup used to repeat the full host pipeline every process:
torch checkpoint load -> LoRA merge -> vocab extension -> int8/int4
quantization (single-threaded numpy, ~17 min at 7B on this host —
BENCH_r03 progress log). The quantized tree is a pure function of the
checkpoint files and the quantization config, so persist it once and
reload with np.load + device_put on later starts.

Cache layout: one .npz per key under the cache dir. Leaves are stored
as a0..aN (bfloat16 via a uint16 view — np.savez has no bf16), with a
JSON `__meta__` record holding the tree skeleton, per-leaf dtypes and
the model config. Keys hash the quantization config plus (relpath,
size, mtime_ns) of every checkpoint file involved, so touching a
checkpoint invalidates its entries (reference counterpart: the eval
loader re-quantizes from scratch per process, llava/model/builder.py:43).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict, Iterable, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from halva_tpu.config import (
    LlavaConfig,
    config_to_dict,
    llava_config_from_dict,
)

SCHEMA = 1

_WEIGHT_EXTS = (".safetensors", ".bin", ".npz", ".json", ".model")


def _file_stats(root: Optional[str]) -> list:
    """(relpath, size, mtime_ns) for every checkpoint-relevant file under
    root (or the file itself), sorted for determinism."""
    if not root:
        return []
    root = os.path.abspath(root)
    if os.path.isfile(root):
        st = os.stat(root)
        return [(os.path.basename(root), st.st_size, st.st_mtime_ns)]
    out = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            if not n.endswith(_WEIGHT_EXTS):
                continue
            p = os.path.join(dirpath, n)
            st = os.stat(p)
            out.append((os.path.relpath(p, root), st.st_size, st.st_mtime_ns))
    return sorted(out)


def cache_key(
    quant: str,
    quant_tp: int,
    dtype,
    paths: Iterable[Optional[str]],
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    manifest = {
        "schema": SCHEMA,
        "quant": quant,
        "quant_tp": quant_tp,
        "dtype": str(jnp.dtype(dtype)),
        "files": {
            str(p): _file_stats(p) for p in paths if p
        },
        "extra": extra or {},
    }
    blob = json.dumps(manifest, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:32]


def _skeleton(node, counter) -> Any:
    if isinstance(node, dict):
        # jax.tree.leaves flattens dicts in SORTED key order — the
        # skeleton's leaf indices must follow the same order or the
        # rebuilt tree comes back with permuted leaves.
        return {
            "t": "d",
            "k": {k: _skeleton(v, counter) for k, v in sorted(node.items())},
        }
    if isinstance(node, (list, tuple)):
        return {
            "t": "l" if isinstance(node, list) else "u",
            "v": [_skeleton(v, counter) for v in node],
        }
    i = counter[0]
    counter[0] += 1
    return {"t": "x", "i": i}


def _rebuild(spec, leaves):
    t = spec["t"]
    if t == "d":
        return {k: _rebuild(v, leaves) for k, v in spec["k"].items()}
    if t in ("l", "u"):
        seq = [_rebuild(v, leaves) for v in spec["v"]]
        return seq if t == "l" else tuple(seq)
    return leaves[spec["i"]]


def save_tree(path: str, params, cfg: LlavaConfig) -> None:
    """Atomic write (tmp + rename): a crashed save never half-populates
    the cache."""
    import jax

    leaves = jax.tree.leaves(params)
    counter = [0]
    spec = _skeleton(params, counter)
    assert counter[0] == len(leaves)
    meta = {
        "schema": SCHEMA,
        "skeleton": spec,
        "dtypes": [str(jnp.dtype(l.dtype)) for l in leaves],
        "config": config_to_dict(cfg),
    }
    arrays = {}
    for i, l in enumerate(leaves):
        a = np.asarray(l)
        if a.dtype == jnp.bfloat16:
            a = a.view(np.uint16)
        arrays[f"a{i}"] = a
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=np.frombuffer(
            json.dumps(meta).encode(), np.uint8
        ), **arrays)
    os.replace(tmp, path)


def load_tree(path: str, put=None) -> Tuple[Any, LlavaConfig]:
    """Rebuild the cached tree. With `put` (leaf -> device array), each
    leaf is handed to it RIGHT AFTER its npz entry is read, so the
    (async) host->device transfer of leaf i overlaps the disk read of
    leaf i+1 — on the axon relay this collapses the serial
    npz_load-then-device_put startup phases into ~max(IO, transfer)
    (EVAL_REAL_v2.json warm: 60.5 s + 153.7 s serial before this).
    The caller fences once at the end (builder._fence_tree)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta.get("schema") != SCHEMA:
            raise ValueError(f"treecache schema {meta.get('schema')} != {SCHEMA}")
        leaves = []
        for i, dt in enumerate(meta["dtypes"]):
            a = z[f"a{i}"]
            if dt == "bfloat16":
                a = a.view(jnp.bfloat16)
            leaves.append(put(a) if put is not None else a)
    params = _rebuild(meta["skeleton"], leaves)
    return params, llava_config_from_dict(meta["config"])


def cache_dir() -> Optional[str]:
    """HALVA_QUANT_CACHE: unset -> /tmp/halva_quant_cache (quantized
    serving trees are expensive to rebuild and cheap to store on this
    platform); "off"/"0"/"" -> disabled; else the given directory."""
    v = os.environ.get("HALVA_QUANT_CACHE", "/tmp/halva_quant_cache")
    if v.lower() in ("off", "0", ""):
        return None
    return v
