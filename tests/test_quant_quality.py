"""Quantized-serving quality proxies at tiny scale (CPU).

The 7B on-chip numbers live in scripts/quant_quality.py (greedy top-1
agreement + prefill logit KL, int8/int4/nf4 vs bf16, identical seeded
weights) — results recorded in STATUS.md. These tests pin the same
contracts at LLAVA_TINY scale so a quantizer regression fails CI:

- int8 prefill logit KL vs bf16 stays tiny (quant noise, not damage);
- greedy first tokens agree (seeded fixture), so a metric computed from
  the generations is IDENTICAL under int8 — shown end-to-end for POPE
  (the reference evaluates quantized models with the same scorers,
  llava/model/builder.py fp16-vs-4/8bit load options,
  train_halva.py:1036-1052).

Tiny models are the WORST case for trajectory agreement (random weights
at hidden=64 have near-tied logits, so any epsilon flips late tokens);
the 0.5 trajectory threshold reflects that, while KL — the robust
damage metric — is orders tighter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAVA_TINY
from halva_tpu.constants import IMAGE_TOKEN_INDEX
from halva_tpu.models import llava
from halva_tpu.ops import generate as gen
from halva_tpu.ops.quant import quantize_params_host

CFG = LLAVA_TINY
B, S, MAX_NEW = 8, 16, 8


@pytest.fixture(scope="module")
def trees():
    params = llava.init_params(jax.random.PRNGKey(1), CFG, jnp.float32)
    q8 = jax.tree.map(
        jnp.asarray, quantize_params_host(params, quantize_embed=False)
    )
    return params, q8


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(1)
    ids = rng.randint(5, 250, (B, S)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    lens = np.full((B,), S, np.int32)
    imgs = rng.randn(
        B, 3, CFG.vision.image_size, CFG.vision.image_size
    ).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(imgs), jnp.asarray(lens)


def _greedy(params, inputs):
    ids, imgs, lens = inputs
    toks, _ = gen.generate_greedy(
        params, CFG, ids, imgs, lens, MAX_NEW, eos_id=-1,
        attn_impl="xla",
    )
    return np.asarray(toks)


def _prefill_logits(params, inputs):
    ids, imgs, lens = inputs
    _, fl, _, _, _ = gen._prefill_phase(
        params, CFG, ids, imgs, lens, MAX_NEW, "xla", False
    )
    return np.asarray(fl, np.float32)


def _log_softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return x - m - np.log(e.sum(-1, keepdims=True))


def test_int8_prefill_kl_small(trees, inputs):
    bl = _prefill_logits(trees[0], inputs)
    ql = _prefill_logits(trees[1], inputs)
    kl = np.mean(
        np.sum(np.exp(_log_softmax(bl)) * (_log_softmax(bl) - _log_softmax(ql)), -1)
    )
    assert kl < 0.01, f"int8 prefill KL too large: {kl}"


def test_int8_token_agreement(trees, inputs):
    bt = _greedy(trees[0], inputs)
    qt = _greedy(trees[1], inputs)
    assert (qt[:, 0] == bt[:, 0]).all(), "first greedy tokens diverged"
    agree = (qt == bt).mean()
    assert agree >= 0.5, f"trajectory agreement collapsed: {agree}"


def test_pope_metric_invariant_under_int8(trees, inputs):
    """End-to-end: the POPE metric computed from int8 generations equals
    the bf16 one (first tokens agree on this fixture; POPE reads only
    the first sentence)."""
    from halva_tpu.evals.pope import eval_pope

    def answers(params):
        toks = _greedy(params, inputs)
        # toy detokenizer: even first token -> "Yes it is", odd -> "No"
        return [
            {"text": "Yes it is." if t % 2 == 0 else "No."}
            for t in toks[:, 0]
        ]

    labels = ["yes", "no"] * (B // 2)
    m_bf16 = eval_pope(answers(trees[0]), labels)
    m_int8 = eval_pope(answers(trees[1]), labels)
    assert m_bf16 == m_int8
