"""Context (sequence) parallelism: attention over sequence-sharded
activations.

Beyond-reference scaling capability (the reference trains 2k-token
HALVA on 4 GPUs with ZeRO-3 and no sequence sharding; VILA's RoPE
context extension — vila/train/utils.py context_length_extension —
makes 16k+ sequences reachable, at which point one chip's activations
no longer fit). Design follows the all-gather-KV recipe: every device
holds an Sq-shard of queries plus its KV shard, all-gathers K/V along
the `seq` axis (bf16 KV at 16k/4096 is ~256 MB — ICI-cheap relative to
the O(S^2/n) attention FLOPs), and runs the local flash kernel with a
global q-row offset so causal / sliding-window / ALiBi terms see global
positions. The backward pass differentiates straight through
`all_gather` (XLA transposes it to a reduce-scatter of dK/dV).

Load balance note: with plain contiguous sharding the causal mask makes
late-sequence shards do more work than early ones (worst-case 2x skew at
large n). That is accepted here — the HALVA/VILA workloads are
throughput-bound on the MLP/projection matmuls, and contiguous shards
keep segment-id packing semantics trivially correct.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from halva_tpu.ops.flash_attention import (
    DEFAULT_BLOCK_K,
    DEFAULT_BLOCK_Q,
    flash_attention,
)

SEQ_AXIS = "seq"


def cp_flash_attention(
    q: jnp.ndarray,  # (B, Sq/n, H, D) local query shard
    k: jnp.ndarray,  # (B, Skv/n, KVH, D) local key shard
    v: jnp.ndarray,
    q_segment_ids: jnp.ndarray,  # (B, Sq/n)
    kv_segment_ids: jnp.ndarray,  # (B, Skv/n)
    axis_name: str = SEQ_AXIS,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    alibi: bool = False,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Per-shard body: call from inside shard_map/pjit with `axis_name`
    bound. Gathers KV, computes local queries vs global KV. Returns the
    local (B, Sq/n, H, D) output shard."""
    idx = jax.lax.axis_index(axis_name)
    sq_local = q.shape[1]
    k_full = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    kvseg_full = jax.lax.all_gather(
        kv_segment_ids, axis_name, axis=1, tiled=True
    )
    return flash_attention(
        q,
        k_full,
        v_full,
        q_segment_ids,
        kvseg_full,
        causal=causal,
        scale=scale,
        block_q=min(block_q, max(sq_local, 8)),
        block_k=block_k,
        alibi=alibi,
        sliding_window=sliding_window,
        q_offset=idx * sq_local,
    )


def context_parallel_attention(
    mesh: Mesh,
    q: jnp.ndarray,  # (B, S, H, D) global (or seq-sharded jax.Array)
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_segment_ids: jnp.ndarray,  # (B, S)
    kv_segment_ids: jnp.ndarray,
    seq_axis: str = SEQ_AXIS,
    batch_axis: Optional[str] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    alibi: bool = False,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """shard_map wrapper: shards the sequence dim of q/k/v/segment ids
    over `seq_axis` (and optionally batch over `batch_axis`) and runs
    cp_flash_attention per shard. Drop-in for ops.attention.attention
    when a mesh with a seq axis is in scope."""
    spec4 = P(batch_axis, seq_axis, None, None)
    spec2 = P(batch_axis, seq_axis)
    body = functools.partial(
        cp_flash_attention,
        axis_name=seq_axis,
        causal=causal,
        scale=scale,
        alibi=alibi,
        sliding_window=sliding_window,
    )
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec2, spec2),
        out_specs=spec4,
        check_vma=False,
    )(q, k, v, q_segment_ids, kv_segment_ids)
