"""Device-side synthetic serving trees must be structural twins of the
host builders.

bench.py (and the train/beam benches) default to generating random
quantized param trees ON DEVICE (init_params_device) because the host
numpy path costs ~20 min/process at 7B; the device plan is derived
independently (_synth_spec), so this pins that both paths produce the
same tree: same leaf paths, shapes, and dtypes, for int8 and int4.
A drift here would silently bench a different model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bench


def _spec_tree(tree):
    return {
        jax.tree_util.keystr(k): (tuple(v.shape), str(jnp.dtype(v.dtype)))
        for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


@pytest.mark.parametrize("weights", ["int8", "int4"])
def test_device_tree_matches_host_tree(weights, monkeypatch):
    cfg = bench.SMALL
    host_build = (
        bench.init_params_host_int4 if weights == "int4"
        else bench.init_params_host_int8
    )
    host = jax.eval_shape(lambda: host_build(cfg))

    monkeypatch.setenv("HALVA_BENCH_PARAM_GEN", "device")
    dev = jax.eval_shape(lambda: bench.synth_params(cfg, weights))

    a, b = _spec_tree(host), _spec_tree(dev)
    assert a.keys() == b.keys(), (
        sorted(set(a) ^ set(b))
    )
    for k in a:
        assert a[k] == b[k], (k, a[k], b[k])


@pytest.mark.parametrize("weights", ["int4", "int4g"])
def test_device_tree_runs_forward(weights):
    """The device-generated int4/int4g tree must actually drive the
    serving forward (dense dispatches on leaf names — a mis-keyed tree
    would fall through to the bf16 branch and KeyError; int4g addition-
    ally pins the grouped-K scale layout against w4_dense_stacked)."""
    from halva_tpu.models import llava
    from halva_tpu.constants import IMAGE_TOKEN_INDEX

    cfg = bench.SMALL
    params = bench.synth_params(cfg, weights)
    if weights == "int4g":
        scales = params["llm"]["layers"]["attn"]["wq"]["kernel_scale4p"]
        assert scales.shape[2] > 1, "int4g tree must carry grouped scales"
    ids = np.full((1, 8), 5, np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    imgs = np.zeros((1, 3, cfg.vision.image_size, cfg.vision.image_size),
                    np.float32)
    logits, _ = llava.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(imgs),
        segment_ids=jnp.ones((1, 8), jnp.int32), attn_impl="xla",
    )
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))
