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


def test_tensor_parallel_propagate_fallback_parity(
    params, single, monkeypatch
):
    """HALVA_TP_IMPL=propagate forces the sharding-propagation TP jit;
    tokens must still match the single-device program (this used to be
    the only TP mode; it remains the route for packed-int4/NF4 trees)."""
    monkeypatch.setenv("HALVA_TP_IMPL", "propagate")
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


def test_manual_tp_is_the_default_route(params):
    """The tiny bf16 tree divides 2-way, so the shard_map TP path (which
    keeps Pallas kernels available per shard) must be selected; packed
    int4 trees must route to propagation."""
    assert partition.manual_tp_ready(params, CFG, 2)
    from halva_tpu.ops.w4_matmul import quantize_params_int4_host

    # int4 nibble packing interleaves output channels -> not shardable
    # by positional slice; manual_tp_ready must reject it
    p4 = quantize_params_int4_host(
        jax.tree.map(np.asarray, params)
    )
    assert not partition.manual_tp_ready(p4, CFG, 2)


def test_tensor_parallel_int8_token_parity(params, monkeypatch):
    """Manual TP with int8 weights (weight-dequant mode): kernel scales
    follow the column split; tokens match the single-device int8
    program. W8A8 mode is excluded here — its per-TOKEN activation
    scales are computed over the local K-shard under TP (a valid,
    finer-grained quantization that is deliberately not bit-equal; see
    test_manual_tp_w8a8_kslip_is_requantization)."""
    from halva_tpu.ops import quant
    from halva_tpu.ops.quant import quantize_params_host

    monkeypatch.setattr(quant, "_W8A8", False)
    p8 = quantize_params_host(jax.tree.map(np.asarray, params))
    assert partition.manual_tp_ready(p8, CFG, 2)
    ids, images, lens = _inputs()
    # max_new differs from the module's other generate calls: the jit
    # cache must not reuse an executable traced under W8A8=True
    max_new = MAX_NEW + 4
    toks1, num1 = generate(
        p8, CFG, ids, images, lens, max_new, eos_id=EOS,
        attn_impl="xla",
    )
    mesh = mesh_lib.make_mesh(
        data=2, model=2, devices=jax.devices()[:4]
    )
    toks2, num2 = generate(
        p8, CFG, ids, images, lens, max_new, eos_id=EOS,
        attn_impl="xla", mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(toks2), np.asarray(toks1))
    np.testing.assert_array_equal(np.asarray(num2), np.asarray(num1))


def test_tensor_parallel_int4_token_parity(params):
    """Manual TP with tp-packed int4 weights (the headline serving
    format): token parity with the single-device int4 program. The
    tp-aware packing changes only the nibble PAIRING, not the
    quantized values (per-column scales), so the dequantized math is
    identical up to the K-split fp32 reassociation."""
    from halva_tpu.ops.w4_matmul import quantize_params_int4_host

    pnp = jax.tree.map(np.asarray, params)
    p1 = quantize_params_int4_host(pnp)
    ptp = quantize_params_int4_host(pnp, tp=2)
    ids, images, lens = _inputs()
    max_new = MAX_NEW + 8  # own jit-cache key
    toks1, num1 = generate(
        p1, CFG, ids, images, lens, max_new, eos_id=EOS,
        attn_impl="xla",
    )
    mesh = mesh_lib.make_mesh(
        data=2, model=2, devices=jax.devices()[:4]
    )
    assert partition.manual_tp_ready(ptp, CFG, 2)
    toks2, num2 = generate(
        ptp, CFG, ids, images, lens, max_new, eos_id=EOS,
        attn_impl="xla", mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(toks2), np.asarray(toks1))
    np.testing.assert_array_equal(np.asarray(num2), np.asarray(num1))


def test_tensor_parallel_int4_kv8_token_parity(params):
    """The headline serving config (int4 weights + int8 KV cache) under
    manual TP: per-(token, head) KV scales quantize identically on
    local head slices, so tokens match the single-device program."""
    from halva_tpu.ops.w4_matmul import quantize_params_int4_host

    pnp = jax.tree.map(np.asarray, params)
    p1 = quantize_params_int4_host(pnp)
    ptp = quantize_params_int4_host(pnp, tp=2)
    ids, images, lens = _inputs()
    max_new = MAX_NEW + 16  # own jit-cache key
    toks1, num1 = generate(
        p1, CFG, ids, images, lens, max_new, eos_id=EOS,
        attn_impl="xla", kv_quant="int8",
    )
    mesh = mesh_lib.make_mesh(
        data=2, model=2, devices=jax.devices()[:4]
    )
    toks2, num2 = generate(
        ptp, CFG, ids, images, lens, max_new, eos_id=EOS,
        attn_impl="xla", kv_quant="int8", mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(toks2), np.asarray(toks1))
    np.testing.assert_array_equal(np.asarray(num2), np.asarray(num1))


def test_tp_packed_tree_refused_on_global_routes(params, monkeypatch):
    """A tp-packed int4 tree dequants to block-permuted channels on any
    global (non-shard_map) consumer: generate must refuse loudly for
    (a) single-device calls and (b) the propagation fallback, instead
    of emitting garbage."""
    from halva_tpu.ops.w4_matmul import quantize_params_int4_host

    ptp = quantize_params_int4_host(jax.tree.map(np.asarray, params), tp=2)
    ids, images, lens = _inputs()
    with pytest.raises(ValueError, match="w4_pack_tp"):
        generate(
            ptp, CFG, ids, images, lens, MAX_NEW, eos_id=EOS,
            attn_impl="xla",
        )
    monkeypatch.setenv("HALVA_TP_IMPL", "propagate")
    mesh = mesh_lib.make_mesh(
        data=2, model=2, devices=jax.devices()[:4]
    )
    with pytest.raises(ValueError, match="w4_pack_tp"):
        generate(
            ptp, CFG, ids, images, lens, MAX_NEW, eos_id=EOS,
            attn_impl="xla", mesh=mesh,
        )


def test_manual_tp_w8a8_ksplit_is_requantization():
    """Under manual TP, W8A8's dynamic per-token activation scale is
    computed over the LOCAL K-shard of row-split layers (wo/down) —
    each shard gets a FINER quantization grid than the single-chip
    program, so results differ by ~the activation quantization step
    and no more. Pin that bound (a sharding bug would blow it up)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from halva_tpu.models.llama import dense
    from halva_tpu.ops import quant
    from halva_tpu.ops.quant import quantize_params_host

    old = quant._W8A8
    quant.set_w8a8(True)
    try:
        rng = np.random.RandomState(0)
        k, n = 64, 128
        w = rng.randn(k, n).astype(np.float32) * 0.05
        x = jnp.asarray(rng.randn(4, k).astype(np.float32))
        p = quantize_params_host({"d": {"kernel": w}})["d"]
        y_full = dense(x, p)
        mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("model",))

        def body(px, pq, ps):
            y = dense(px, {"kernel_q": pq, "kernel_scale": ps})
            return jax.lax.psum(y, "model")

        y_tp = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(None, "model"), P("model", None), P()),
            out_specs=P(),
            check_vma=False,
        )(x, p["kernel_q"], p["kernel_scale"])
        err = float(jnp.max(jnp.abs(y_full - y_tp)))
        ref = float(jnp.max(jnp.abs(y_full)))
        # activation-grid-level difference, far above fp noise but far
        # below signal (measured 0.0067 at these shapes)
        assert err < 0.05 * ref, (err, ref)
    finally:
        quant._W8A8 = old


def test_shmap_pspecs_split_layers_only(params):
    """eval_shmap_pspecs: layer kernels split over "model" (columns for
    wq/wk/wv/gate/up, rows for wo/down), int8 scales follow their
    kernel, everything else fully replicated."""
    from jax.sharding import PartitionSpec as P

    mesh = mesh_lib.make_mesh(
        data=2, model=2, devices=jax.devices()[:4]
    )
    specs = partition.eval_shmap_pspecs(params, mesh)
    lyr = specs["llm"]["layers"]
    assert lyr["attn"]["wq"]["kernel"] == P(None, None, "model")
    assert lyr["attn"]["wo"]["kernel"] == P(None, "model", None)
    assert lyr["mlp"]["gate"]["kernel"] == P(None, None, "model")
    assert lyr["mlp"]["down"]["kernel"] == P(None, "model", None)
    assert specs["llm"]["embed"]["embedding"] == P()
    assert specs["llm"]["lm_head"]["kernel"] == P()
    for leaf in jax.tree.leaves(
        specs["vision"], is_leaf=lambda x: isinstance(x, P)
    ):
        assert leaf == P()
    # int8 tree: N-split scales, replicated K-split scales
    from halva_tpu.ops.quant import quantize_params_host

    p8 = quantize_params_host(jax.tree.map(np.asarray, params))
    s8 = partition.eval_shmap_pspecs(p8, mesh)
    l8 = s8["llm"]["layers"]
    assert l8["attn"]["wq"]["kernel_scale"] == P(None, None, "model")
    assert l8["attn"]["wo"]["kernel_scale"] == P()


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


def test_sampling_decorrelated_across_data_shards(params):
    """Identical prompts placed on DIFFERENT data shards must not draw
    identical token sequences: the replicated rng is folded with the
    shard's axis index (without it, every shard consumed the same key
    and same-logits rows sampled in lockstep)."""
    b = 8
    rng = np.random.RandomState(1)
    ids = np.tile(
        rng.randint(5, 200, (1, 24)).astype(np.int32), (b, 1)
    )
    ids[:, 1] = IMAGE_TOKEN_INDEX
    lens = np.full((b,), 24, np.int32)
    images = np.tile(
        rng.randn(1, 3, CFG.vision.image_size, CFG.vision.image_size)
        .astype(np.float32),
        (b, 1, 1, 1),
    )
    mesh = mesh_lib.make_mesh(
        data=4, model=1, devices=jax.devices()[:4]
    )
    toks, _ = generate(
        params, CFG, jnp.asarray(ids), jnp.asarray(images),
        jnp.asarray(lens), MAX_NEW, eos_id=EOS, attn_impl="xla",
        temperature=1.0, mesh=mesh,
        rng=jax.random.PRNGKey(7),
    )
    toks = np.asarray(toks)
    # rows 0 and 2 sit on different shards (batch 8 over 4 shards of 2)
    assert not np.array_equal(toks[0], toks[2]), toks[:4]


def test_batch_must_divide_data_axis(params):
    mesh = mesh_lib.make_mesh(
        data=4, model=1, devices=jax.devices()[:4]
    )
    ids, images, lens = _inputs(b=6, dead_rows=())
    with pytest.raises(ValueError, match="mesh data axis"):
        generate(
            params, CFG, ids, images, lens, MAX_NEW, eos_id=EOS,
            attn_impl="xla", mesh=mesh,
        )


def test_jit_cache_keyed_on_tree_structure(params, single):
    """Two param trees with DIFFERENT pytree structures (bf16 vs int8)
    at identical (cfg, shapes, max_new) must not share a cached
    shard_map fn — the in_specs are derived from the tree given to the
    FIRST call, and reusing them for the other tree is a pytree
    mismatch (round-3 review finding). The bf16 `single` fixture +
    data-mesh call already populated this exact key."""
    from halva_tpu.ops.quant import quantize_params_host

    p8 = quantize_params_host(jax.tree.map(np.asarray, params))
    ids, images, lens = _inputs()
    toks1, num1 = generate(
        p8, CFG, ids, images, lens, MAX_NEW, eos_id=EOS,
        attn_impl="xla",
    )
    mesh = mesh_lib.make_mesh(
        data=4, model=1, devices=jax.devices()[:4]
    )
    # same key as test_data_parallel_mesh_token_parity except treedef
    toks2, num2 = generate(
        p8, CFG, ids, images, lens, MAX_NEW, eos_id=EOS,
        attn_impl="xla", mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(toks2), np.asarray(toks1))
    np.testing.assert_array_equal(np.asarray(num2), np.asarray(num1))
    # and the bf16 entry was not clobbered either
    toks3, _ = generate(
        params, CFG, ids, images, lens, MAX_NEW, eos_id=EOS,
        attn_impl="xla", mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(toks3), single[0])


def test_jit_cache_keyed_on_quant_globals(params, monkeypatch):
    """set_w8a8/set_w4a8 flip which dense kernel a trace embeds without
    changing any shape: the cache key must change with them, or an
    in-process toggle silently serves the stale executable."""
    from halva_tpu.ops import quant
    from halva_tpu.ops.generate import _params_key

    monkeypatch.setattr(quant, "_W8A8", True)
    monkeypatch.setattr(quant, "_W4A8", False)
    k1 = _params_key(params)
    monkeypatch.setattr(quant, "_W8A8", False)
    k2 = _params_key(params)
    monkeypatch.setattr(quant, "_W4A8", True)
    k3 = _params_key(params)
    assert k1 != k2 and k2 != k3 and k1 != k3


def test_propagation_tp_splits_quantized_leaves(params):
    """The propagation-TP serving plan must TP-split int4/NF4/int8
    leaves over "model" — these trees are exactly the ones routed to
    propagation (manual TP rejects plain-packed int4 and NF4), and
    replicating them forfeits the HBM relief --mesh-model exists for
    (round-3 review finding)."""
    from halva_tpu.ops.quant import quantize_params
    from halva_tpu.ops.w4_matmul import quantize_params_int4_host
    from halva_tpu.parallel.mesh import MODEL_AXIS

    mesh = mesh_lib.make_mesh(
        data=2, model=2, devices=jax.devices()[:4]
    )

    def spec_of(tree, path):
        specs = partition.eval_param_pspecs(tree, mesh)
        node = specs
        for k in path.split("/"):
            node = node[k]
        return node

    p4 = quantize_params_int4_host(jax.tree.map(np.asarray, params))
    for leaf, dim in (
        ("llm/layers/attn/wq/kernel_q4p", -1),
        ("llm/layers/attn/wq/kernel_scale4p", -1),
        ("llm/layers/mlp/gate/kernel_q4p", -1),
        ("llm/layers/attn/wo/kernel_q4p", 1),
        ("llm/layers/mlp/down/kernel_q4p", 1),
    ):
        sp = tuple(spec_of(p4, leaf))
        assert len(sp) and sp[dim] == MODEL_AXIS, (leaf, sp)

    # NF4 code planes are jnp.uint4 — device_put with a sharded layout
    # recurses on the axon platform (CLAUDE.md landmine), so they must
    # REPLICATE; their bf16 scales still TP-split
    pnf4 = quantize_params(params, bits=4)
    sp = spec_of(pnf4, "llm/layers/attn/wq/kernel_q4")
    assert all(a is None for a in tuple(sp)), sp
    sp = tuple(spec_of(pnf4, "llm/layers/mlp/gate/kernel_scale4"))
    assert sp[-1] == MODEL_AXIS, sp


def test_propagation_tp_int4_token_parity(params, single, monkeypatch):
    """End-to-end: a PLAIN (tp=1) packed-int4 tree on a model>1 mesh
    routes to propagation and must match its own single-device tokens —
    the newly TP-split packed/scale leaves change only layout, never
    math."""
    monkeypatch.setenv("HALVA_TP_IMPL", "propagate")
    from halva_tpu.ops.w4_matmul import quantize_params_int4_host

    p4 = quantize_params_int4_host(jax.tree.map(np.asarray, params))
    ids, images, lens = _inputs()
    max_new = MAX_NEW + 20  # own jit-cache key
    toks1, num1 = generate(
        p4, CFG, ids, images, lens, max_new, eos_id=EOS,
        attn_impl="xla",
    )
    mesh = mesh_lib.make_mesh(
        data=2, model=2, devices=jax.devices()[:4]
    )
    toks2, num2 = generate(
        p4, CFG, ids, images, lens, max_new, eos_id=EOS,
        attn_impl="xla", mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(toks2), np.asarray(toks1))
    np.testing.assert_array_equal(np.asarray(num2), np.asarray(num1))
