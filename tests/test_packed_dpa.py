"""Packed DPA training path: packed batches must reproduce the
row-per-sample loss exactly (same samples, same params).

Covers: host doc expansion + scatter-splice (llava.forward_packed),
per-token-sample-id phrase accumulation (dpa.packed_alignment_loss),
n_samples loss normalization, and the batcher's placement invariants.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from halva_tpu.config import LLAVA_TINY
from halva_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from halva_tpu.models import llava
from halva_tpu.train import data as data_lib
from halva_tpu.train import lora as lora_lib
from halva_tpu.train import trainer as trainer_lib
from halva_tpu.train.pack import PackedDPABatcher, expand_image_doc

CFG = LLAVA_TINY
T = CFG.num_image_tokens
IMG = CFG.vision.image_size


def _make_items(n, seed=0, with_ref_image=True):
    rng = np.random.RandomState(seed)
    items = []
    for i in range(n):
        ln = int(rng.randint(9, 15))
        ids = rng.randint(5, 60, ln).astype(np.int32)
        ids[0] = 1  # BOS
        ids[2] = IMAGE_TOKEN_INDEX
        labels = rng.randint(5, 60, ln).astype(np.int32)
        sup_from = int(rng.randint(4, 6))
        labels[:sup_from] = IGNORE_INDEX
        signs = np.zeros(ln, np.int32)
        # two phrases in the supervised tail (where labels are real)
        signs[sup_from + 1] = 1
        if ln - 2 > sup_from + 2:
            signs[ln - 2] = 2
        nln = int(rng.randint(9, 15))
        nids = rng.randint(5, 60, nln).astype(np.int32)
        nids[0] = 1
        nids[2] = IMAGE_TOKEN_INDEX
        nlabels = rng.randint(5, 60, nln).astype(np.int32)
        nlabels[:sup_from] = IGNORE_INDEX
        nsigns = np.zeros(nln, np.int32)
        nsigns[sup_from + 1] = 1
        if nln - 2 > sup_from + 2:
            nsigns[nln - 2] = 2
        # keep unique(pos) == unique(neg) (HallDataset contract)
        if not (2 in signs and 2 in nsigns):
            signs[signs == 2] = 0
            nsigns[nsigns == 2] = 0
        rln = int(rng.randint(8, 13))
        rids = rng.randint(5, 60, rln).astype(np.int32)
        rids[0] = 1
        if with_ref_image:
            rids[1] = IMAGE_TOKEN_INDEX
        rlabels = rng.randint(5, 60, rln).astype(np.int32)
        rlabels[:4] = IGNORE_INDEX
        items.append(
            {
                "input_ids": ids,
                "labels": labels,
                "pos_signs": signs,
                "neg_input_ids": nids,
                "neg_labels": nlabels,
                "neg_signs": nsigns,
                "ref_input_ids": rids,
                "ref_labels": rlabels,
                "image": rng.randn(3, IMG, IMG).astype(np.float32) * 0.2,
                "ref_image": (
                    rng.randn(3, IMG, IMG).astype(np.float32) * 0.2
                    if with_ref_image
                    else np.zeros((3, IMG, IMG), np.float32)
                ),
            }
        )
    return items


def _batcher(max_samples=4, seq_len=64, pn_rows=3, ref_rows=2):
    return PackedDPABatcher(
        seq_len=seq_len,
        pn_rows=pn_rows,
        ref_rows=ref_rows,
        max_samples=max_samples,
        num_image_tokens=T,
        pad_token_id=0,
        image_shape=(3, IMG, IMG),
    )


def test_expand_image_doc():
    ids = np.array([1, 7, IMAGE_TOKEN_INDEX, 9], np.int32)
    labels = np.array([IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 9], np.int32)
    signs = np.array([0, 0, 0, 2], np.int32)
    out_ids, out_labels, out_signs, off = expand_image_doc(
        ids, labels, signs, 3, pad_token_id=0
    )
    assert off == 2
    np.testing.assert_array_equal(out_ids, [1, 7, 0, 0, 0, 9])
    np.testing.assert_array_equal(
        out_labels, [IGNORE_INDEX] * 5 + [9]
    )
    np.testing.assert_array_equal(out_signs, [0, 0, 0, 0, 0, 2])
    # no sentinel -> unchanged
    same = expand_image_doc(ids[[0, 1, 3]], labels[[0, 1, 3]], None, 3, 0)
    assert same[3] is None
    np.testing.assert_array_equal(same[0], ids[[0, 1, 3]])


def test_batcher_invariants():
    items = _make_items(4, seed=3)
    b = _batcher()
    batches = list(b.batches(iter(items)))
    assert len(batches) >= 1
    total = sum(int(x["n_samples"]) for x in batches)
    assert total == 4
    bt = batches[0]
    n = int(bt["n_samples"])
    # token conservation: every document's tokens appear exactly once
    for i, item in enumerate(items[:n]):
        sid = i + 1
        pos_mask = (bt["pn_sample_ids"] == sid) & (bt["pn_neg_flags"] == 0)
        exp_len = len(item["input_ids"]) + T - 1
        assert int(pos_mask.sum()) == exp_len
        neg_mask = (bt["pn_sample_ids"] == sid) & (bt["pn_neg_flags"] == 1)
        assert int(neg_mask.sum()) == len(item["neg_input_ids"]) + T - 1
    # positions restart per document
    for r in range(bt["pn_positions"].shape[0]):
        seg = bt["pn_segment_ids"][r]
        pos = bt["pn_positions"][r]
        for s in np.unique(seg[seg > 0]):
            assert pos[seg == s][0] == 0
    # padding scatter entries target the drop row
    live = bt["pn_img_row"] < bt["pn_input_ids"].shape[0]
    assert int(live.sum()) == 2 * n  # pos + neg placement per sample


def _unpacked_loss(items, tcfg, policy, base):
    batch = data_lib.collate(items, pad_token_id=0, pad_multiple=8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    trainable, frozen, optimizer, opt_state = (
        trainer_lib.init_train_state(policy, tcfg)
    )
    _, eval_loss = trainer_lib.dpa_step_fns(CFG, tcfg, optimizer)
    m = jax.jit(eval_loss)(trainable, frozen, base, batch)
    return m


def _packed_loss(items, tcfg, policy, base, max_samples=4):
    b = _batcher(max_samples=max_samples)
    batches = list(b.batches(iter(items)))
    assert len(batches) == 1, "test items must fit one packed batch"
    batch = {k: jnp.asarray(v) for k, v in batches[0].items()}
    trainable, frozen, optimizer, opt_state = (
        trainer_lib.init_train_state(policy, tcfg)
    )
    step_fn, eval_loss = trainer_lib.packed_dpa_step_fns(
        CFG, tcfg, optimizer, max_samples=max_samples
    )
    m = jax.jit(eval_loss)(trainable, frozen, base, batch)
    return m, (step_fn, trainable, frozen, opt_state, batch)


@pytest.mark.parametrize("with_ref_image", [True, False])
def test_packed_loss_matches_unpacked(with_ref_image):
    items = _make_items(4, seed=11, with_ref_image=with_ref_image)
    base = llava.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    policy = lora_lib.add_lora(
        base, jax.random.PRNGKey(1), rank=4, alpha=8.0
    )
    tcfg = trainer_lib.TrainConfig(
        learning_rate=1e-3,
        grad_accum_steps=1,
        num_train_steps=4,
        attn_impl="xla",
        loss_chunk=8,
    )
    m_un = _unpacked_loss(items, tcfg, policy, base)
    m_pk, _ = _packed_loss(items, tcfg, policy, base)
    np.testing.assert_allclose(
        float(m_pk.alignment), float(m_un.alignment), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m_pk.divergence), float(m_un.divergence), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m_pk.loss), float(m_un.loss), rtol=2e-4
    )


def test_packed_train_step_matches_unpacked_grads():
    """One optimizer step from identical state: metrics (incl. grad
    norm) and updated LoRA leaves agree between the two paths."""
    items = _make_items(3, seed=21)
    base = llava.init_params(jax.random.PRNGKey(2), CFG, jnp.float32)
    policy = lora_lib.add_lora(
        base, jax.random.PRNGKey(3), rank=4, alpha=8.0
    )
    tcfg = trainer_lib.TrainConfig(
        learning_rate=1e-3,
        grad_accum_steps=1,
        num_train_steps=4,
        attn_impl="xla",
        loss_chunk=8,
    )

    batch = data_lib.collate(items, pad_token_id=0, pad_multiple=8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    trainable, frozen, optimizer, opt_state = (
        trainer_lib.init_train_state(policy, tcfg)
    )
    step_un, _ = trainer_lib.dpa_step_fns(CFG, tcfg, optimizer)
    new_un, _, m_un = jax.jit(step_un)(
        trainable, frozen, base, opt_state, batch
    )

    m_pk, (step_pk, tr, fz, opt_pk, pbatch) = _packed_loss(
        items, tcfg, policy, base, max_samples=3
    )
    new_pk, _, m_pk2 = jax.jit(step_pk)(tr, fz, base, opt_pk, pbatch)

    np.testing.assert_allclose(
        float(m_pk2.loss), float(m_un.loss), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m_pk2.grad_norm), float(m_un.grad_norm), rtol=5e-3,
        atol=1e-7,
    )
    ga = jax.tree.leaves(new_un)
    gb = jax.tree.leaves(new_pk)
    assert len(ga) == len(gb)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-6
        )


def test_oversize_pair_drops_instead_of_crashing():
    """A sample whose pos+neg together exceed every row of an EMPTY
    batch must be dropped (counted), not assert-kill the run."""
    items = _make_items(3, seed=7)
    # one row only: pos (len ~12+T-1) + neg can exceed 24 together but
    # each fits alone
    b = _batcher(max_samples=4, seq_len=24, pn_rows=1, ref_rows=1)
    batches = list(b.batches(iter(items)))
    placed = sum(int(x["n_samples"]) for x in batches)
    assert placed + b.dropped == 3
    assert b.dropped >= 1  # at least one pair cannot share the row


def test_neg_without_image_sentinel():
    """pos has IMAGE_TOKEN_INDEX, neg does not: the neg doc packs with
    pad embeddings (no scatter entry), no crash; and vice versa."""
    items = _make_items(2, seed=9)
    items[0]["neg_input_ids"] = np.where(
        items[0]["neg_input_ids"] == IMAGE_TOKEN_INDEX,
        np.int32(7),
        items[0]["neg_input_ids"],
    ).astype(np.int32)
    items[1]["input_ids"] = np.where(
        items[1]["input_ids"] == IMAGE_TOKEN_INDEX,
        np.int32(7),
        items[1]["input_ids"],
    ).astype(np.int32)
    b = _batcher()
    batches = list(b.batches(iter(items)))
    assert sum(int(x["n_samples"]) for x in batches) == 2
    bt = batches[0]
    live = bt["pn_img_row"] < bt["pn_input_ids"].shape[0]
    # one placement for each asymmetric sample (pos-only / neg-only)
    assert int(live.sum()) == 2
