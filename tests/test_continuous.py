"""Continuous batching (ops/continuous.py): token parity with the
one-shot program + slot-refill mechanics.

The engine must emit, for EVERY request, exactly the tokens the
one-shot generate produces for that prompt — across refills, ring
wraps, dead padding rows, and budget exits (round-4 verdict item 5;
the reference's bs=1 loop is the behavioral contract,
eval_hall/model_vqa_loader.py:102-111)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAVA_TINY
from halva_tpu.constants import IMAGE_TOKEN_INDEX
from halva_tpu.models import llava
from halva_tpu.ops.continuous import ContinuousEngine, Request
from halva_tpu.ops.generate import generate

CFG = LLAVA_TINY
PAD = 24
MAX_NEW = 16


@pytest.fixture(scope="module")
def params():
    return llava.init_params(jax.random.PRNGKey(0), CFG)


def _requests(n, seed=0):
    rng = np.random.RandomState(seed)
    reqs = []
    for i in range(n):
        s = int(rng.randint(10, PAD + 1))
        ids = rng.randint(5, 200, (s,)).astype(np.int32)
        ids[1] = IMAGE_TOKEN_INDEX
        img = rng.randn(
            3, CFG.vision.image_size, CFG.vision.image_size
        ).astype(np.float32)
        budget = int(rng.randint(3, MAX_NEW + 1))
        reqs.append(Request(ids=ids, image=img, budget=budget))
    return reqs


def _oneshot(params, req: Request):
    """Reference: the one-shot program on this single prompt, no EOS
    (eos -1), trimmed to the request budget."""
    ids = np.zeros((1, PAD), np.int32)
    ids[0, : len(req.ids)] = req.ids
    toks, _ = generate(
        params, CFG, jnp.asarray(ids),
        jnp.asarray(req.image[None]),
        jnp.asarray(np.asarray([len(req.ids)], np.int32)),
        MAX_NEW, eos_id=-1, attn_impl="xla",
    )
    return np.asarray(toks)[0, : req.budget]


def test_token_parity_with_refills(params):
    # 22 ragged requests through an 8-slot engine: ~3 generations of
    # occupancy, refills at several bucket sizes, ring wrap
    reqs = _requests(22)
    eng = ContinuousEngine(
        params, CFG, batch=8, max_new_tokens=MAX_NEW, eos_id=-1,
        prompt_pad=PAD, chunk=4, attn_impl="xla",
    )
    out = eng.run(reqs)
    assert all(r is not None for r in out)
    for i, (toks, n) in enumerate(out):
        assert n == reqs[i].budget, (i, n, reqs[i].budget)
        np.testing.assert_array_equal(
            toks[:n], _oneshot(params, reqs[i]), err_msg=f"req {i}"
        )
    # the whole point: far fewer lockstep steps than 22 * MAX_NEW / 8
    assert eng.stats["refills"] >= 2
    assert eng.stats["steps"] < 22 * MAX_NEW


def test_token_parity_sub_batch_refills(params):
    """max_refill below the batch (the serving memory cap that keeps a
    whole-batch refill prefill from sitting next to the full state —
    the b56 eval_real_cont OOM): refills arrive in R-row buckets and
    the scatter must write ONLY the R rows (the _seq_pad batch-dim
    padding bug this exposed on-chip). Token parity across buckets."""
    reqs = _requests(20, seed=3)
    eng = ContinuousEngine(
        params, CFG, batch=16, max_new_tokens=MAX_NEW, eos_id=-1,
        prompt_pad=PAD, chunk=4, attn_impl="xla", max_refill=8,
    )
    assert max(eng.refill_sizes) == 8 < eng.b
    out = eng.run(reqs)
    assert all(r is not None for r in out)
    for i, (toks, n) in enumerate(out):
        assert n == reqs[i].budget, (i, n, reqs[i].budget)
        np.testing.assert_array_equal(
            toks[:n], _oneshot(params, reqs[i]), err_msg=f"req {i}"
        )
    assert eng.stats["refills"] >= 2


def test_eos_exit_frees_slots(params):
    # pick an eos that actually occurs: run one-shot for request 0 and
    # use its 3rd generated token as the eos id
    reqs = _requests(6, seed=3)
    probe = _oneshot(params, reqs[0]._replace(budget=MAX_NEW))
    eos = int(probe[2])
    eng = ContinuousEngine(
        params, CFG, batch=8, max_new_tokens=MAX_NEW, eos_id=eos,
        prompt_pad=PAD, chunk=4, attn_impl="xla",
    )
    out = eng.run(
        [r._replace(budget=MAX_NEW) for r in reqs]
    )
    toks0, n0 = out[0]
    assert n0 <= 3 or toks0[2] == eos
    # parity incl. the eos cut for row 0
    assert toks0[2] == probe[2]
    np.testing.assert_array_equal(toks0[:3], probe[:3])


def test_kv_quant_paths(params):
    reqs = _requests(10, seed=5)
    for kvq in ("int8", "int4"):
        eng = ContinuousEngine(
            params, CFG, batch=8, max_new_tokens=MAX_NEW, eos_id=-1,
            prompt_pad=PAD, chunk=4, attn_impl="xla", kv_quant=kvq,
        )
        out = eng.run(reqs)
        for i, (toks, n) in enumerate(out):
            ids = np.zeros((1, PAD), np.int32)
            ids[0, : len(reqs[i].ids)] = reqs[i].ids
            ref, _ = generate(
                params, CFG, jnp.asarray(ids),
                jnp.asarray(reqs[i].image[None]),
                jnp.asarray(
                    np.asarray([len(reqs[i].ids)], np.int32)
                ),
                MAX_NEW, eos_id=-1, attn_impl="xla", kv_quant=kvq,
            )
            np.testing.assert_array_equal(
                toks[:n], np.asarray(ref)[0, :n],
                err_msg=f"kv={kvq} req {i}",
            )


def test_ring_wrap_reuses_slots(params):
    """More total tokens than Sg per slot: rows cycling through a slot
    must overwrite the previous occupant's ring columns and still match
    one-shot decode (stale-KV invisibility)."""
    reqs = [r._replace(budget=MAX_NEW) for r in _requests(9, seed=7)]
    eng = ContinuousEngine(
        params, CFG, batch=8, max_new_tokens=MAX_NEW, eos_id=-1,
        prompt_pad=PAD, chunk=4, attn_impl="xla",
    )
    out = eng.run(reqs)
    for i, (toks, n) in enumerate(out):
        np.testing.assert_array_equal(
            toks[:n], _oneshot(params, reqs[i]), err_msg=f"req {i}"
        )
