"""Sequence packing: conservation, per-document isolation, and equality of
packed vs unpacked forward logits."""

import numpy as np

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAMA_TINY
from halva_tpu.models import llama
from halva_tpu.ops.packing import pack_batch_np, plan_packing, unpack_logps


def test_plan_conservation():
    plan = plan_packing([5, 9, 3, 7, 2], max_len=10)
    assert (plan.segment_ids != 0).sum() == 26
    # 9 can't share with 7 or 5; expect 3 rows at most
    assert plan.src_row.shape[0] <= 3
    # each document occupies a contiguous run with its own positions
    for r in range(plan.segment_ids.shape[0]):
        seg = plan.segment_ids[r]
        for doc in set(seg[seg != 0].tolist()):
            pos = plan.positions[r][seg == doc]
            np.testing.assert_array_equal(pos, np.arange(len(pos)))


def test_packed_forward_matches_unpacked():
    cfg = LLAMA_TINY
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    lens = [7, 11, 4]
    samples = [
        {"ids": rng.randint(5, 200, (l,)).astype(np.int32)} for l in lens
    ]

    # unpacked: one row per sample
    ref_logits = []
    for s in samples:
        lg = llama.forward(
            params, cfg, jnp.asarray(s["ids"][None]), attn_impl="xla"
        )
        ref_logits.append(np.asarray(lg)[0])

    packed, plan = pack_batch_np(samples, ["ids"], max_len=12, fill={"ids": 0})
    logits = llama.forward(
        params,
        cfg,
        jnp.asarray(packed["ids"]),
        segment_ids=jnp.asarray(plan.segment_ids),
        positions=jnp.asarray(plan.positions),
        attn_impl="xla",
    )
    logits = np.asarray(logits)
    for r in range(plan.src_row.shape[0]):
        m = plan.segment_ids[r] != 0
        rows = plan.src_row[r][m]
        idxs = plan.src_idx[r][m]
        for out_slot, (sr, si) in enumerate(
            zip(rows, idxs)
        ):
            slot = np.where(m)[0][out_slot]
            np.testing.assert_allclose(
                logits[r, slot], ref_logits[sr][si], atol=2e-4, rtol=1e-3
            )


def test_unpack_roundtrip():
    plan = plan_packing([3, 5], max_len=8)
    packed_vals = np.zeros(plan.segment_ids.shape, np.float32)
    c = 1.0
    for r in range(packed_vals.shape[0]):
        for i in range(packed_vals.shape[1]):
            if plan.segment_ids[r, i]:
                packed_vals[r, i] = c
                c += 1
    out = np.asarray(unpack_logps(jnp.asarray(packed_vals), plan, 2, 5))
    assert (out[0, :3] != 0).all()
    assert (out[1, :5] != 0).all()
    assert out[0, 3:].sum() == 0
