"""DPA loss math vs a direct torch oracle of the reference equations
(llava/train/halva_trainer.py:392-419,534-592)."""

import numpy as np
import pytest

import jax.numpy as jnp

from halva_tpu.constants import IGNORE_INDEX
from halva_tpu.train import dpa

torch = pytest.importorskip("torch")


def _oracle(
    pos_logits, neg_logits, pos_labels, neg_labels, pos_signs, neg_signs,
    pol_ref_logits, frz_ref_logits, ref_labels, alpha,
):
    """Reference math, re-derived in torch."""
    import torch.nn.functional as F

    def cal_logp(logits, labels):
        labels = labels[:, 1:].clone()
        logits = logits[:, :-1]
        labels[labels == IGNORE_INDEX] = 0
        return torch.gather(
            logits.log_softmax(-1), 2, labels.unsqueeze(2)
        ).squeeze(2)

    def accumulate(logps, signs):
        uniq = torch.unique(signs, sorted=True)
        acc = torch.zeros(signs.size(0), len(uniq) - 1, dtype=logps.dtype)
        for i, s in enumerate(uniq[1:]):
            acc[:, i] = (logps * (signs == s).float()).sum(dim=-1)
        return acc

    pos_lp = cal_logp(pos_logits, pos_labels)
    neg_lp = cal_logp(neg_logits, neg_labels)
    pos_mask = (pos_labels[:, 1:] != IGNORE_INDEX).float()
    neg_mask = (neg_labels[:, 1:] != IGNORE_INDEX).float()
    pos_lp = pos_lp * pos_mask
    neg_lp = neg_lp * neg_mask
    ps = pos_signs[:, 1:].clone()
    ns = neg_signs[:, 1:].clone()
    ps[ps == IGNORE_INDEX] = 0
    ns[ns == IGNORE_INDEX] = 0
    align = torch.log(
        1 + torch.exp(accumulate(neg_lp, ns) - accumulate(pos_lp, ps))
    ).mean()

    r_labels = ref_labels[:, 1:]
    mask = (r_labels != IGNORE_INDEX).float()
    r = F.softmax(frz_ref_logits[:, :-1], dim=-1)
    p = F.softmax(pol_ref_logits[:, :-1], dim=-1)
    div = (r * (r.log() - p.log())) * mask.unsqueeze(-1)
    div = div.sum() / pos_logits.shape[0]
    return (align + alpha * div).item(), align.item(), div.item()


def _make_batch(seed=0, b=2, s=12, v=32, k_phrases=3):
    rng = np.random.RandomState(seed)
    pos_logits = rng.randn(b, s, v).astype(np.float32)
    neg_logits = rng.randn(b, s, v).astype(np.float32)
    pol_ref_logits = rng.randn(b, s, v).astype(np.float32)
    frz_ref_logits = rng.randn(b, s, v).astype(np.float32)

    def labels_signs():
        lab = rng.randint(0, v, (b, s)).astype(np.int64)
        lab[:, : s // 2] = IGNORE_INDEX  # prompt part ignored
        sg = np.zeros((b, s), np.int64)
        for i in range(b):
            # phrases of 2 tokens each in the answer region
            for k in range(1, k_phrases + 1):
                st = s // 2 + (k - 1) * 2
                if st + 1 < s:
                    sg[i, st : st + 2] = k
        return lab, sg

    pos_labels, pos_signs = labels_signs()
    neg_labels, neg_signs = labels_signs()
    ref_labels, _ = labels_signs()
    return (
        pos_logits, neg_logits, pos_labels, neg_labels,
        pos_signs, neg_signs, pol_ref_logits, frz_ref_logits, ref_labels,
    )


@pytest.mark.parametrize("alpha", [0.0, 0.4])
def test_dpa_loss_matches_oracle(alpha):
    batch = _make_batch()
    (pl_, nl, plab, nlab, ps, ns, prl, frl, rlab) = batch

    want_total, want_align, want_div = _oracle(
        *(torch.tensor(x) for x in batch), alpha
    )

    got = dpa.dpa_loss(
        jnp.asarray(pl_), jnp.asarray(nl),
        jnp.asarray(plab.astype(np.int32)), jnp.asarray(nlab.astype(np.int32)),
        jnp.asarray(ps.astype(np.int32)), jnp.asarray(ns.astype(np.int32)),
        jnp.asarray(prl), jnp.asarray(frl),
        jnp.asarray(rlab.astype(np.int32)),
        alpha=alpha,
    )
    assert abs(float(got.alignment) - want_align) < 1e-5
    assert abs(float(got.divergence) - want_div) < 1e-3
    assert abs(float(got.total) - want_total) < 1e-3


@pytest.mark.parametrize("chunk", [3, 5, 16])
def test_chunked_loss_matches_full(chunk):
    """dpa_loss_from_hidden (vocab-streaming 7B memory path) must equal
    dpa_loss on the materialized logits — including grads w.r.t. hidden."""
    import jax

    rng = np.random.RandomState(3)
    b, s, d, v = 2, 11, 8, 32
    w = rng.randn(d, v).astype(np.float32) * 0.3
    lm = {"kernel": jnp.asarray(w)}

    def logits_fn(h):
        return jnp.dot(h, lm["kernel"]).astype(jnp.float32)

    hids = {
        k: jnp.asarray(rng.randn(b, s, d).astype(np.float32))
        for k in ("pos", "neg", "pref", "fref")
    }
    batch = _make_batch(seed=4, b=b, s=s, v=v)
    (_, _, plab, nlab, ps, ns, _, _, rlab) = batch
    args = (
        jnp.asarray(plab.astype(np.int32)),
        jnp.asarray(nlab.astype(np.int32)),
        jnp.asarray(ps.astype(np.int32)),
        jnp.asarray(ns.astype(np.int32)),
    )
    rlab32 = jnp.asarray(rlab.astype(np.int32))

    def full(hs):
        return dpa.dpa_loss(
            logits_fn(hs["pos"]), logits_fn(hs["neg"]), *args,
            logits_fn(hs["pref"]), logits_fn(hs["fref"]), rlab32,
            alpha=0.4,
        ).total

    def chunked(hs):
        return dpa.dpa_loss_from_hidden(
            logits_fn, hs["pos"], hs["neg"], *args,
            hs["pref"], hs["fref"], rlab32, alpha=0.4, chunk=chunk,
        ).total

    np.testing.assert_allclose(
        float(full(hids)), float(chunked(hids)), rtol=1e-5
    )
    g_full = jax.grad(full)(hids)
    g_chunk = jax.grad(chunked)(hids)
    for k in hids:
        np.testing.assert_allclose(
            np.asarray(g_full[k]), np.asarray(g_chunk[k]),
            rtol=1e-4, atol=1e-6,
        )


def test_trainer_chunked_step_matches_full():
    """A full train step under loss_chunk equals the classic path."""
    import jax

    from halva_tpu.config import LLAVA_TINY
    from halva_tpu.models import llava
    from halva_tpu.train import lora as lora_lib
    from halva_tpu.train import trainer as trainer_lib

    cfg = LLAVA_TINY
    base = llava.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    policy = lora_lib.add_lora(base, jax.random.PRNGKey(1), rank=4, alpha=8.0)
    rng = np.random.RandomState(5)
    b, s = 2, 10
    ids = rng.randint(5, 60, (b, s)).astype(np.int32)
    ids[:, 1] = -200
    seg = np.ones((b, s), np.int32)
    lab = rng.randint(0, 60, (b, s)).astype(np.int32)
    lab[:, :4] = IGNORE_INDEX
    sg = np.zeros((b, s), np.int32)
    sg[:, 5:7] = 1
    imgs = rng.randn(
        b, 3, cfg.vision.image_size, cfg.vision.image_size
    ).astype(np.float32)
    batch = {
        "input_ids": ids, "neg_input_ids": ids,
        "segment_ids": seg, "neg_segment_ids": seg,
        "labels": lab, "neg_labels": lab,
        "pos_signs": sg, "neg_signs": sg,
        "images": imgs,
        "ref_input_ids": ids, "ref_images": imgs,
        "ref_segment_ids": seg, "ref_labels": lab,
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = {}
    for chunk in (None, 4):
        tcfg = trainer_lib.TrainConfig(
            learning_rate=1e-3, grad_accum_steps=1, num_train_steps=4,
            attn_impl="xla", loss_chunk=chunk,
        )
        trainable, frozen, optimizer, opt_state = (
            trainer_lib.init_train_state(policy, tcfg)
        )
        step_fn, _ = trainer_lib.dpa_step_fns(cfg, tcfg, optimizer)
        _, _, m = jax.jit(step_fn)(
            trainable, frozen, base, opt_state, batch
        )
        losses[chunk] = (
            float(m.loss), float(m.alignment),
            float(m.divergence), float(m.grad_norm),
        )
    np.testing.assert_allclose(losses[None][:3], losses[4][:3], rtol=2e-4)
    # grad_norm is ~1e-6 here (LoRA B starts at 0); fp reassociation
    # between the fused and chunked lm_head dots dominates — atol only
    np.testing.assert_allclose(
        losses[None][3], losses[4][3], rtol=0.05, atol=1e-8
    )


def test_dpa_loss_uneven_phrases():
    """Rows with different phrase counts: reference unique() is
    batch-global, so absent phrases contribute log(2)."""
    batch = list(_make_batch(seed=1))
    ps, ns = batch[4], batch[5]
    # row 1 loses phrase 3 in both pos and neg
    ps[1][ps[1] == 3] = 0
    ns[1][ns[1] == 3] = 0

    want_total, want_align, want_div = _oracle(
        *(torch.tensor(x) for x in batch), 0.4
    )
    got = dpa.dpa_loss(
        jnp.asarray(batch[0]), jnp.asarray(batch[1]),
        jnp.asarray(batch[2].astype(np.int32)),
        jnp.asarray(batch[3].astype(np.int32)),
        jnp.asarray(ps.astype(np.int32)), jnp.asarray(ns.astype(np.int32)),
        jnp.asarray(batch[6]), jnp.asarray(batch[7]),
        jnp.asarray(batch[8].astype(np.int32)),
        alpha=0.4,
    )
    assert abs(float(got.alignment) - want_align) < 1e-5
    assert abs(float(got.total) - want_total) < 1e-3
