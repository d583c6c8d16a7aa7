"""VILA component flags, context extension, per-component checkpoints,
and cluster lifecycle callbacks."""

import os
import time

import numpy as np
import pytest

import jax

from halva_tpu.config import LLAMA_TINY, LLAVA_TINY, VILA_13B_384
from halva_tpu.models import llava
from halva_tpu.train import lora
from halva_tpu.train.vila import (
    TuningFlags,
    component_trainable_mask,
    context_length_extension,
    load_components,
    save_components,
)
from halva_tpu.utils.cluster import PreemptionWatcher, WallClockGuard


def _params():
    p = llava.init_params(jax.random.PRNGKey(0), LLAVA_TINY)
    return lora.add_lora(p, jax.random.PRNGKey(1), rank=2)


def _on(mask, prefix):
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    out = []
    for kp, v in flat:
        path = "/".join(
            str(k.key) for k in kp if hasattr(k, "key")
        )
        if path.startswith(prefix):
            out.append(v)
    return out


def test_component_masks():
    params = _params()
    m = component_trainable_mask(
        params, TuningFlags(tune_mm_projector=True)
    )
    assert all(_on(m, "projector"))
    assert not any(_on(m, "vision"))
    # llm: only lora on
    llm_on = [
        v
        for kp, v in jax.tree_util.tree_flatten_with_path(m)[0]
        if v and "llm" in str(kp)
    ]
    assert llm_on  # lora factors

    m2 = component_trainable_mask(
        params, TuningFlags(tune_vision_tower=True, lora_llm=False)
    )
    assert all(_on(m2, "vision"))
    assert not any(_on(m2, "llm"))


def test_context_length_extension():
    cfg = context_length_extension(LLAMA_TINY, 1024)
    assert cfg.rope_scaling == 1024 / LLAMA_TINY.max_position_embeddings
    assert cfg.max_position_embeddings == 1024
    # no-op when within range
    assert context_length_extension(LLAMA_TINY, 128).rope_scaling is None


def test_vila_preset():
    assert VILA_13B_384.mm_projector_type == "mlp_downsample"
    assert VILA_13B_384.vision.use_cls_token is False
    # 384/14 = 27 patches per side -> 729; mlp_downsample needs even grid
    assert VILA_13B_384.vision.num_patches == 729


def test_component_checkpoint_roundtrip(tmp_path):
    params = llava.init_params(jax.random.PRNGKey(0), LLAVA_TINY)
    save_components(str(tmp_path / "m"), params)
    assert (tmp_path / "m" / "llm").exists()
    assert (tmp_path / "m" / "vision_tower").exists()
    assert (tmp_path / "m" / "mm_projector").exists()
    loaded = load_components(str(tmp_path / "m"), like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preemption_watcher_sentinel(tmp_path):
    sentinel = str(tmp_path / "STOP")
    w = PreemptionWatcher(sentinel_path=sentinel, check_every=1)
    assert not w.should_stop(1)
    open(sentinel, "w").close()
    assert w.should_stop(2)
    assert w.should_stop(3)  # latched


def test_preemption_watcher_probe():
    calls = []
    w = PreemptionWatcher(probe=lambda: len(calls) > 0, check_every=2)
    assert not w.should_stop(2)
    calls.append(1)
    assert not w.should_stop(3)  # off-cadence step skips the probe
    assert w.should_stop(4)


def test_wall_clock_guard():
    g = WallClockGuard(total_limit_min=100.0, pre_terminate_min=10.0)
    assert not g.should_stop()
    g2 = WallClockGuard(total_limit_min=0.01, pre_terminate_min=10.0)
    assert g2.should_stop()
    assert not WallClockGuard(None).should_stop()
