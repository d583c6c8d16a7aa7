"""Mesh-sharded batched eval decode == single-device decode, token for
token (SURVEY.md §2.5 eval-DP: the slice-level replacement for the
reference's one-process-per-GPU eval fanout,
eval_hall/model_vqa_loader.py:19-27).

Two mesh modes of ops/generate.generate:
- {data: N} (model == 1): shard_map pure data parallelism — each shard
  runs the full single-chip program on its batch slice.
- {data: N, model: M}: tensor parallelism via sharding-propagation jit
  (weights TP-split per partition.EVAL_LOGICAL_TO_MESH, caches pinned
  batch-over-data / heads-over-model).

Also covers dead-row semantics: prompt_length 0 rows emit zero tokens
(the tail-batch padding contract of evals/runner.BatchedGenerator).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAVA_TINY
from halva_tpu.constants import IMAGE_TOKEN_INDEX
from halva_tpu.models import llava
from halva_tpu.ops.generate import generate
from halva_tpu.parallel import mesh as mesh_lib
from halva_tpu.parallel import partition

CFG = LLAVA_TINY
EOS = 2
MAX_NEW = 12


def _inputs(b=8, s=24, dead_rows=(6,)):
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 200, (b, s)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    lens = np.full((b,), s, np.int32)
    lens[0] = 17  # ragged prompt lengths
    lens[3] = 11
    for i in dead_rows:
        ids[i] = 0
        lens[i] = 0
    images = rng.randn(
        b, 3, CFG.vision.image_size, CFG.vision.image_size
    ).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(images), jnp.asarray(lens)


@pytest.fixture(scope="module")
def params():
    return llava.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def single(params):
    ids, images, lens = _inputs()
    toks, num = generate(
        params, CFG, ids, images, lens, MAX_NEW, eos_id=EOS,
        attn_impl="xla",
    )
    return np.asarray(toks), np.asarray(num)


def test_dead_rows_emit_nothing(single):
    toks, num = single
    assert num[6] == 0
    assert (toks[6] == EOS).all()


def test_data_parallel_mesh_token_parity(params, single):
    mesh = mesh_lib.make_mesh(
        data=4, model=1, devices=jax.devices()[:4]
    )
    ids, images, lens = _inputs()
    toks, num = generate(
        params, CFG, ids, images, lens, MAX_NEW, eos_id=EOS,
        attn_impl="xla", mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(toks), single[0])
    np.testing.assert_array_equal(np.asarray(num), single[1])


def test_tensor_parallel_mesh_token_parity(params, single):
    mesh = mesh_lib.make_mesh(
        data=2, model=2, devices=jax.devices()[:4]
    )
    ids, images, lens = _inputs()
    toks, num = generate(
        params, CFG, ids, images, lens, MAX_NEW, eos_id=EOS,
        attn_impl="xla", mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(toks), single[0])
    np.testing.assert_array_equal(np.asarray(num), single[1])


def test_tp_weights_actually_shard(params):
    """The TP plan must split head/mlp dims over "model" (not silently
    replicate) for the tiny config used above."""
    mesh = mesh_lib.make_mesh(
        data=2, model=2, devices=jax.devices()[:4]
    )
    specs = partition.eval_param_pspecs(params, mesh)
    wq = specs["llm"]["layers"]["attn"]["wq"]["kernel"]
    assert wq == jax.sharding.PartitionSpec(None, None, "model")
    gate = specs["llm"]["layers"]["mlp"]["gate"]["kernel"]
    assert gate == jax.sharding.PartitionSpec(None, None, "model")
    # eval plan never FSDP-shards over data (decode would all-gather
    # the full model every token)
    flat = jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
    )
    for spec in flat:
        for entry in spec:
            assert entry != "data"


def test_batch_must_divide_data_axis(params):
    mesh = mesh_lib.make_mesh(
        data=4, model=1, devices=jax.devices()[:4]
    )
    ids, images, lens = _inputs(b=6, dead_rows=())
    with pytest.raises(ValueError, match="divide the mesh"):
        generate(
            params, CFG, ids, images, lens, MAX_NEW, eos_id=EOS,
            attn_impl="xla", mesh=mesh,
        )
