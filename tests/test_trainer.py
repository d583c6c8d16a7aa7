"""End-to-end DPA train step on the tiny model: loss decreases, only LoRA
params update, works sharded on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAVA_TINY
from halva_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from halva_tpu.models import llava
from halva_tpu.parallel import mesh as mesh_lib
from halva_tpu.parallel import partition
from halva_tpu.train import lora, trainer

CFG = LLAVA_TINY


def _fake_batch(b=2, s=16, seed=0):
    rng = np.random.RandomState(seed)

    def ids_group(with_signs):
        ids = rng.randint(5, 200, (b, s)).astype(np.int32)
        ids[:, 1] = IMAGE_TOKEN_INDEX
        seg = np.ones((b, s), np.int32)
        seg[:, s - 3 :] = 0
        labels = ids.copy()
        labels[:, : s // 2] = IGNORE_INDEX
        labels[seg == 0] = IGNORE_INDEX
        signs = np.zeros((b, s), np.int32)
        if with_signs:
            signs[:, s // 2 : s // 2 + 2] = 1
            signs[:, s // 2 + 3 : s // 2 + 5] = 2
        return ids, seg, labels, signs

    ids, seg, lab, sg = ids_group(True)
    nids, nseg, nlab, nsg = ids_group(True)
    rids, rseg, rlab, _ = ids_group(False)
    img_s = CFG.vision.image_size
    return {
        "input_ids": ids,
        "segment_ids": seg,
        "labels": lab,
        "pos_signs": sg,
        "neg_input_ids": nids,
        "neg_segment_ids": nseg,
        "neg_labels": nlab,
        "neg_signs": nsg,
        "ref_input_ids": rids,
        "ref_segment_ids": rseg,
        "ref_labels": rlab,
        "images": rng.randn(b, 3, img_s, img_s).astype(np.float32),
        "ref_images": rng.randn(b, 3, img_s, img_s).astype(np.float32),
    }


def _setup(tcfg):
    params = llava.init_params(jax.random.PRNGKey(0), CFG)
    params = lora.add_lora(params, jax.random.PRNGKey(1), rank=4, alpha=8)
    ref_params = llava.init_params(jax.random.PRNGKey(0), CFG)
    trainable, frozen, opt, opt_state = trainer.init_train_state(
        params, tcfg
    )
    step, eval_loss = trainer.dpa_step_fns(CFG, tcfg, opt)
    return params, ref_params, trainable, frozen, opt_state, step, eval_loss


def test_train_step_decreases_loss():
    tcfg = trainer.TrainConfig(
        learning_rate=1e-3,
        grad_accum_steps=1,
        num_train_steps=10,
        attn_impl="xla",
        remat=False,
        loss_alpha=0.4,
    )
    (params, ref_params, trainable, frozen, opt_state, step, eval_loss) = (
        _setup(tcfg)
    )
    batch = {k: jnp.asarray(v) for k, v in _fake_batch().items()}

    step = jax.jit(step)
    m0 = None
    for i in range(5):
        trainable, opt_state, metrics = step(
            trainable, frozen, ref_params, opt_state, batch
        )
        if i == 0:
            m0 = float(metrics.loss)
    assert float(metrics.loss) < m0
    assert np.isfinite(float(metrics.loss))
    assert float(metrics.grad_norm) > 0


def test_only_lora_updates():
    tcfg = trainer.TrainConfig(
        learning_rate=1e-2, grad_accum_steps=1, num_train_steps=10,
        attn_impl="xla", remat=False,
    )
    (params, ref_params, trainable, frozen, opt_state, step, _) = _setup(
        tcfg
    )
    batch = {k: jnp.asarray(v) for k, v in _fake_batch().items()}
    step = jax.jit(step)
    # step 0 applies lr=0 (warmup ramp start); take two steps
    new_trainable, opt_state, _ = step(
        trainable, frozen, ref_params, opt_state, batch
    )
    new_trainable, _, _ = step(
        new_trainable, frozen, ref_params, opt_state, batch
    )
    flat_old = jax.tree_util.tree_flatten_with_path(trainable)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_trainable)[0]
    changed = 0
    for (kp, old), (_, new) in zip(flat_old, flat_new):
        name = str(kp[-1].key)
        assert name in ("lora_a", "lora_b")
        if np.abs(np.asarray(old) - np.asarray(new)).max() > 0:
            changed += 1
    assert changed > 0


def test_grad_accum_updates_every_k():
    tcfg = trainer.TrainConfig(
        learning_rate=1e-2, grad_accum_steps=2, num_train_steps=10,
        attn_impl="xla", remat=False,
    )
    (params, ref_params, trainable, frozen, opt_state, step, _) = _setup(
        tcfg
    )
    batch = {k: jnp.asarray(v) for k, v in _fake_batch().items()}
    step = jax.jit(step)
    t1, opt_state, _ = step(trainable, frozen, ref_params, opt_state, batch)
    # first micro-step: no param change yet
    for a, b in zip(jax.tree.leaves(trainable), jax.tree.leaves(t1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2, opt_state, _ = step(t1, frozen, ref_params, opt_state, batch)
    t3, opt_state, _ = step(t2, frozen, ref_params, opt_state, batch)
    t4, opt_state, _ = step(t3, frozen, ref_params, opt_state, batch)
    # after warmup, a full accumulation window applies an update
    diffs = [
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(jax.tree.leaves(t2), jax.tree.leaves(t4))
    ]
    assert max(diffs) > 0


def test_train_step_sharded_matches_single():
    tcfg = trainer.TrainConfig(
        learning_rate=1e-3, grad_accum_steps=1, num_train_steps=10,
        attn_impl="xla", remat=True,
    )
    (params, ref_params, trainable, frozen, opt_state, step, _) = _setup(
        tcfg
    )
    batch = {k: jnp.asarray(v) for k, v in _fake_batch(b=8).items()}

    _, _, m_single = jax.jit(step)(
        trainable, frozen, ref_params, opt_state, batch
    )

    m = mesh_lib.make_mesh(data=8, model=1)
    shard = lambda t: jax.tree.map(
        jax.device_put,
        t,
        partition.param_shardings(t, m),
    )
    sh_batch = partition.shard_batch(batch, m)
    _, _, m_mesh = jax.jit(step)(
        shard(trainable),
        shard(frozen),
        shard(ref_params),
        jax.tree.map(jax.device_put, opt_state, partition.param_shardings(opt_state, m)),
        sh_batch,
    )
    np.testing.assert_allclose(
        float(m_mesh.loss), float(m_single.loss), rtol=1e-4
    )


def test_mesh_constraints_preserve_math():
    """dpa_step_fns(mesh=...) adds batch-sharding constraints in the
    decoder scan + chunked loss (comm-efficiency under FSDP — see
    dpa._batch_constrainer); constraints must not change the math:
    metrics equal the unconstrained step bit-for-bit-ish."""
    tcfg = trainer.TrainConfig(
        learning_rate=1e-3, grad_accum_steps=1, num_train_steps=4,
        attn_impl="xla", loss_chunk=8,
    )
    batch = {k: jnp.asarray(v) for k, v in _fake_batch(b=8).items()}

    params = llava.init_params(jax.random.PRNGKey(0), CFG)
    params = lora.add_lora(params, jax.random.PRNGKey(1), rank=4, alpha=8)
    trainable, frozen, opt, opt_state = trainer.init_train_state(
        params, tcfg
    )
    step_plain, _ = trainer.dpa_step_fns(CFG, tcfg, opt)
    _, _, m_plain = jax.jit(step_plain)(
        trainable, frozen, None, opt_state, batch
    )

    mesh = mesh_lib.make_mesh(data=4, model=2, devices=jax.devices()[:8])
    step_mesh, _ = trainer.dpa_step_fns(CFG, tcfg, opt, mesh=mesh)
    shard = lambda t: jax.tree.map(
        jax.device_put, t, partition.param_shardings(t, mesh)
    )
    sbatch = partition.shard_batch(batch, mesh)
    _, _, m_mesh = jax.jit(step_mesh)(
        shard(trainable), shard(frozen), None, shard(opt_state), sbatch
    )
    np.testing.assert_allclose(
        float(m_plain.loss), float(m_mesh.loss), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(m_plain.alignment), float(m_mesh.alignment), rtol=2e-5
    )
