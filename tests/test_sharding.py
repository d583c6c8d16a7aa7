"""FSDP/TP sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from halva_tpu.config import LlamaConfig
from halva_tpu.models import llama
from halva_tpu.parallel import mesh as mesh_lib
from halva_tpu.parallel import partition

CFG = LlamaConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_layers=2,
    num_heads=4,
    max_position_embeddings=256,
)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_fsdp_pspecs():
    m = mesh_lib.make_mesh(data=8, model=1)
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    specs = partition.param_pspecs(params, m)
    assert specs["layers"]["attn"]["wq"]["kernel"] == P(None, "data", "model")
    assert specs["layers"]["mlp"]["down"]["kernel"] == P(
        None, "model", "data"
    )
    assert specs["final_norm"]["scale"] == P("data")


def test_tp_pspecs_fall_back_when_indivisible():
    m = mesh_lib.make_mesh(data=2, model=4)
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    specs = partition.param_pspecs(params, m)
    # heads dim = 64 divisible by 4 -> sharded on model
    assert specs["layers"]["attn"]["wq"]["kernel"][2] == "model"


def test_sharded_forward_matches_single_device():
    m = mesh_lib.make_mesh(data=8, model=1)
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    ids = np.random.RandomState(0).randint(0, 256, (8, 16))

    want = np.asarray(
        llama.forward(params, CFG, jnp.asarray(ids), attn_impl="xla")
    )

    sharded = partition.shard_params(params, m)
    batch = jax.device_put(
        jnp.asarray(ids), partition.batch_sharding(m)
    )

    @jax.jit
    def f(p, x):
        return llama.forward(p, CFG, x, attn_impl="xla")

    got = np.asarray(f(sharded, batch))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_sharded_grad_matches_single_device():
    m = mesh_lib.make_mesh(data=4, model=2)
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    ids = np.random.RandomState(1).randint(0, 256, (4, 8))

    def loss(p, x):
        lg = llama.forward(p, CFG, x, attn_impl="xla")
        return jnp.mean(lg**2)

    want = jax.grad(loss)(params, jnp.asarray(ids))

    sharded = partition.shard_params(params, m)
    batch = jax.device_put(jnp.asarray(ids), partition.batch_sharding(m))
    got = jax.jit(jax.grad(loss))(sharded, batch)

    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), atol=1e-4, rtol=1e-3
        )
