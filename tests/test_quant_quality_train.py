"""CPU twin of scripts/quant_quality_train.py: frozen-base quantization
damage to the DPA training signal (round-4 verdict item 6).

At tiny scale, the same measurement machinery (add_lora_host +
trainer.loss_and_grads + the grad comparison) must show (a) int8-base
loss/grads near the bf16-base values, (b) the comparison wired
correctly (self-comparison = identity). The 7B on-chip numbers land in
TRAIN_QUANT_QUALITY.json via the chip queue."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAVA_TINY
from halva_tpu.models import llava
from halva_tpu.ops.quant import quantize_params_host
from halva_tpu.train import trainer as trainer_lib

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")


@pytest.fixture(scope="module")
def qqt():
    import quant_quality_train as m

    return m


@pytest.fixture(scope="module")
def host_tree():
    params = llava.init_params(
        jax.random.PRNGKey(0), LLAVA_TINY, jnp.float32
    )
    return jax.tree.map(lambda x: np.asarray(x), params)


def _measure(qqt, tree, mode):
    import copy

    t = copy.deepcopy(tree)
    if mode == "int8":
        t = quantize_params_host(t)
    t = qqt.add_lora_host(t, rank=4)
    params = jax.tree.map(jnp.asarray, t)
    tcfg = trainer_lib.TrainConfig(
        learning_rate=0.0, grad_accum_steps=1, num_train_steps=1,
        attn_impl="xla", remat=False, loss_chunk=None,
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in qqt.make_batch(
            LLAVA_TINY, b=1, s=24, vocab_hi=200
        ).items()
    }
    return qqt.measure(params, LLAVA_TINY, tcfg, batch)


def test_int8_base_training_signal_close(qqt, host_tree, tmp_path):
    l_b, a_b, kl_b, g_b = _measure(qqt, host_tree, "bf16")
    l_8, a_8, kl_8, g_8 = _measure(qqt, host_tree, "int8")
    # loss parts shift by quantization noise, not structure
    assert abs(l_8 - l_b) < 0.25 * max(abs(l_b), 1.0), (l_8, l_b)
    # gradient direction survives int8: cosine close to 1
    flat_b = jax.tree_util.tree_flatten_with_path(g_b)[0]
    flat_8 = jax.tree_util.tree_flatten_with_path(g_8)[0]
    # lora grads exist and are nonzero
    names = ["/".join(str(getattr(k, "key", k)) for k in kp)
             for kp, _ in flat_b]
    assert any("lora_a" in n for n in names)
    va = np.concatenate([np.ravel(v) for _, v in flat_b])
    v8 = np.concatenate([np.ravel(v) for _, v in flat_8])
    assert np.linalg.norm(va) > 0
    cos = float(
        np.dot(va, v8) / (np.linalg.norm(va) * np.linalg.norm(v8))
    )
    assert cos > 0.9, cos

    # the report comparison helper: self-comparison is exact identity
    npz = tmp_path / "a.npz"
    np.savez(
        npz,
        **{n: v for n, (_, v) in zip(names, flat_b)},
        _loss=np.float32(l_b),
    )
    z = np.load(npz)
    cos2, rel2 = qqt.compare(z, z)
    assert cos2 == pytest.approx(1.0)
    assert rel2 == 0.0


def test_kl_ref_uses_same_quantized_base(qqt, host_tree):
    # KL at step 0 with lora_b != 0 must be > 0 (policy != ref through
    # the adapters) and finite under an int8 base
    _, _, kl, _ = _measure(qqt, host_tree, "int8")
    assert np.isfinite(kl) and kl >= 0
