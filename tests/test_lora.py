"""LoRA tree transform: identity at init, merge == runtime, masks, io."""

import numpy as np

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAMA_TINY
from halva_tpu.models import llama
from halva_tpu.train import lora


def _params():
    return llama.init_params(jax.random.PRNGKey(0), LLAMA_TINY)


def _fwd(params, ids):
    return np.asarray(
        llama.forward(params, LLAMA_TINY, jnp.asarray(ids), attn_impl="xla")
    )


def test_lora_identity_at_init():
    params = _params()
    ids = np.random.RandomState(0).randint(0, 200, (1, 8))
    base = _fwd(params, ids)
    lp = lora.add_lora(
        params, jax.random.PRNGKey(1), rank=4, alpha=8,
        targets=lora.LLM_TARGETS,
    )
    np.testing.assert_allclose(_fwd(lp, ids), base, atol=1e-5)


def test_lora_merge_matches_runtime():
    params = _params()
    lp = lora.add_lora(
        params, jax.random.PRNGKey(1), rank=4, alpha=8,
        targets=lora.LLM_TARGETS,
    )
    # give B a nonzero value so the adapter does something
    lp = jax.tree.map(lambda x: x, lp)
    for path, p in lora._iter_dense(lp):
        if "lora_b" in p:
            p["lora_b"] = (
                jax.random.normal(jax.random.PRNGKey(2), p["lora_b"].shape)
                * 0.02
            )
    ids = np.random.RandomState(0).randint(0, 200, (1, 8))
    runtime = _fwd(lp, ids)
    merged = lora.merge_lora(lp)
    np.testing.assert_allclose(_fwd(merged, ids), runtime, atol=1e-4)
    # merged tree has no lora leaves
    assert not any(
        "lora" in p for _, pp in lora._iter_dense(merged) for p in pp
    )
    base = _fwd(params, ids)
    assert np.abs(runtime - base).max() > 1e-4  # adapter changed something


def test_trainable_mask():
    params = {"llm": _params()}
    lp = lora.add_lora(params, jax.random.PRNGKey(1), rank=4)
    mask = lora.trainable_mask(lp)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = [kp for kp, v in flat if v]
    off = [kp for kp, v in flat if not v]
    assert len(on) > 0 and len(off) > 0
    for kp, v in flat:
        name = str(kp[-1].key)
        assert v == (name in ("lora_a", "lora_b"))
    # extra trainable: projector-style path
    mask2 = lora.trainable_mask(
        {"projector": {"layers": [{"kernel": np.zeros((2, 2))}]}, **lp},
        extra_trainable=(r"^projector/",),
    )
    assert mask2["projector"]["layers"][0]["kernel"] is True


def test_lora_state_dict_roundtrip():
    params = _params()
    lp = lora.add_lora(
        params, jax.random.PRNGKey(1), rank=4, targets=lora.LLM_TARGETS
    )
    sd = lora.lora_state_dict(lp)
    assert sd  # non-empty
    stripped = lora.strip_lora(lp)
    restored = lora.load_lora_state_dict(
        lora.add_lora(
            stripped, jax.random.PRNGKey(9), rank=4,
            targets=lora.LLM_TARGETS,
        ),
        sd,
    )
    for (p1, d1), (p2, d2) in zip(
        lora._iter_dense(lp), lora._iter_dense(restored)
    ):
        if "lora_a" in d1:
            np.testing.assert_array_equal(
                np.asarray(d1["lora_a"]), np.asarray(d2["lora_a"])
            )
