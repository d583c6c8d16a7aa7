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


def test_sharded_generate_matches_single_device():
    """Batched decode with FSDP-sharded params + data-sharded batch."""
    from halva_tpu.config import LLAVA_TINY
    from halva_tpu.constants import IMAGE_TOKEN_INDEX
    from halva_tpu.models import llava as llava_mod
    from halva_tpu.ops.generate import generate_greedy

    cfg = LLAVA_TINY
    params = llava_mod.init_params(jax.random.PRNGKey(0), cfg)
    b, s = 8, 7
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 50, (b, s)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    lens = np.full((b,), s, np.int32)
    imgs = rng.randn(
        b, 3, cfg.vision.image_size, cfg.vision.image_size
    ).astype(np.float32)

    want, want_n = generate_greedy(
        params, cfg, jnp.asarray(ids), jnp.asarray(imgs),
        jnp.asarray(lens), max_new_tokens=5, eos_id=-1, attn_impl="xla",
    )

    m = mesh_lib.make_mesh(data=8, model=1)
    sp = partition.shard_params(params, m)
    bs = partition.batch_sharding(m)
    got, got_n = generate_greedy(
        sp, cfg,
        jax.device_put(jnp.asarray(ids), bs),
        jax.device_put(jnp.asarray(imgs), bs),
        jax.device_put(jnp.asarray(lens), bs),
        max_new_tokens=5, eos_id=-1, attn_impl="xla",
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_no_silent_replication_at_7b():
    """Every matched 7B LLM weight must actually shard under the
    production {data:4, model:2} mesh (VERDICT r1: pspec_for silently
    replicates indivisible dims)."""
    import jax

    from halva_tpu.config import LLAVA_V15_7B, LLAVA_V15_13B
    from halva_tpu.models import llava
    from halva_tpu.parallel import mesh as mesh_lib
    from halva_tpu.parallel import partition
    from halva_tpu.train import lora as lora_lib

    devices = jax.devices()[:8]
    mesh = mesh_lib.make_mesh(data=4, model=2, devices=devices)
    for cfg in (LLAVA_V15_7B, LLAVA_V15_13B):
        abs_params = jax.eval_shape(
            lambda c=cfg: lora_lib.add_lora(
                llava.init_params(jax.random.PRNGKey(0), c),
                jax.random.PRNGKey(1),
                rank=128,
            )
        )
        bad = partition.replication_fallbacks(abs_params, mesh)
        assert not bad, bad


def test_replication_fallback_detects_indivisible():
    import jax

    from halva_tpu.config import LlamaConfig
    from halva_tpu.models import llama
    from halva_tpu.parallel import mesh as mesh_lib
    from halva_tpu.parallel import partition

    devices = jax.devices()[:8]
    mesh = mesh_lib.make_mesh(data=4, model=2, devices=devices)
    # intermediate 100 % (model=2) == 0 but hidden 50 % (data=4) != 0
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=50, intermediate_size=100,
        num_layers=1, num_heads=2, max_position_embeddings=64,
    )
    abs_params = jax.eval_shape(
        lambda: {"llm": llama.init_params(jax.random.PRNGKey(0), cfg)}
    )
    bad = partition.replication_fallbacks(abs_params, mesh)
    assert bad and any("embed" in b for b in bad)


def test_replication_fallbacks_skips_size1_dims():
    """A size-1 dim (the G=1 grouped-scale plane of per-channel int4
    wo/down) cannot shard and must NOT be reported as a silent
    replication fallback — the 7B/13B dryrun proofs assert [] on the
    headline int4 serving tree."""
    import jax
    import jax.numpy as jnp

    from halva_tpu.config import PRESETS
    from halva_tpu.models import llava
    from halva_tpu.ops.w4_matmul import quantize_params_int4_host
    from halva_tpu.parallel import partition
    from halva_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    cfg = PRESETS["llava-tiny"]
    p = llava.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    p4 = quantize_params_int4_host(
        jax.tree.map(lambda a: np.asarray(a), p)
    )
    assert partition.replication_fallbacks(p4, mesh) == []
