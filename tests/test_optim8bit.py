"""Block-wise 8-bit Adam (train/optim8bit.py — the reference's
bitsandbytes adamw_bnb_8bit surface, halva_trainer.py:349-361): state
dtypes, trajectory tracking vs f32 optax.adamw, and the trainer wiring."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from halva_tpu.train.optim8bit import scale_by_adam8bit
from halva_tpu.train import trainer as trainer_lib


def _adam(tx8: bool, min_quant_size=4096):
    if tx8:
        return optax.chain(
            scale_by_adam8bit(min_quant_size=min_quant_size),
            optax.scale(-1e-2),
        )
    return optax.chain(
        optax.scale_by_adam(),
        optax.scale(-1e-2),
    )


def test_state_is_quantized():
    params = {
        "big": jnp.zeros((64, 128), jnp.float32),  # 8192 >= threshold
        "small": jnp.zeros((8,), jnp.float32),
    }
    tx = scale_by_adam8bit()
    st = tx.init(params)
    assert st.mu["big"]["m_q"].dtype == jnp.int8
    assert st.mu["big"]["v_q"].dtype == jnp.uint8
    assert st.mu["small"]["m"].dtype == jnp.float32
    # 8-bit state bytes ~= 2 x params (+ block scales), vs 8x for f32
    nbytes = sum(
        np.asarray(v).nbytes for v in jax.tree.leaves(st.mu["big"])
    )
    assert nbytes < 2.1 * params["big"].nbytes / 4 + 1024


def test_tracks_f32_adam_on_quadratic():
    """Minimize ||Wx - y||^2: the 8-bit trajectory must track f32 Adam
    closely (same argmin; small relative drift over 150 steps)."""
    rng = np.random.RandomState(0)
    w0 = jnp.asarray(rng.randn(32, 256), jnp.float32)  # 8192 params
    x = jnp.asarray(rng.randn(256, 16), jnp.float32)
    y = jnp.asarray(rng.randn(32, 16), jnp.float32)

    def loss(w):
        return jnp.mean((w @ x - y) ** 2)

    def run(tx):
        w = w0
        st = tx.init(w)
        losses = []
        for _ in range(150):
            g = jax.grad(loss)(w)
            upd, st = tx.update(g, st)
            w = optax.apply_updates(w, upd)
            losses.append(float(loss(w)))
        return w, losses

    w8, l8 = run(_adam(True, min_quant_size=1024))
    wf, lf = run(_adam(False))
    assert l8[-1] < 0.25 * l8[0], "8-bit Adam failed to optimize"
    # terminal losses comparable (not bit-equal: moments carry ~1e-2
    # relative quantization noise)
    assert abs(l8[-1] - lf[-1]) < 0.15 * (l8[0] - lf[-1])
    # the problem is underdetermined (many exact minimizers): both runs
    # reach ~0 loss but can land on different minimizers; bound the drift
    # loosely rather than expecting endpoint equality
    rel = float(
        jnp.linalg.norm(w8 - wf) / (jnp.linalg.norm(wf) + 1e-9)
    )
    assert rel < 0.2, rel


def test_none_placeholders_pass_through():
    """Trainable trees carry None placeholders for frozen leaves
    (trainer.split_params); the transform must preserve them."""
    params = {"a": jnp.ones((4096,), jnp.float32), "b": None}
    tx = scale_by_adam8bit()
    st = tx.init(params)
    g = {"a": jnp.ones((4096,), jnp.float32) * 0.1, "b": None}
    upd, st = tx.update(g, st)
    assert upd["b"] is None
    assert upd["a"].shape == (4096,)


def test_trainer_optim_flag():
    tcfg = trainer_lib.TrainConfig(optim="adamw8bit", num_train_steps=10)
    params = {"w": jnp.ones((64, 128), jnp.float32)}
    tx = trainer_lib.make_optimizer(tcfg, params)
    st = tx.init(params)
    g = {"w": jnp.full((64, 128), 0.1, jnp.float32)}
    upd, _ = tx.update(g, st, params)
    assert np.all(np.isfinite(np.asarray(upd["w"])))

    import pytest

    with pytest.raises(ValueError, match="unknown optim"):
        trainer_lib.make_optimizer(
            trainer_lib.TrainConfig(optim="sgd!", num_train_steps=1),
            params,
        )
