"""Checkpoint portability: template-free restores must not depend on
the saving platform's devices.

Orbax stamps the saving process's device strings into the checkpoint
(`_sharding`: {"sharding_type": "SingleDeviceSharding", "device_str":
"TFRT_CPU_0"}). The reference ships torch .bin files, which are
device-free by construction (llava/model/builder.py loads them
anywhere); our orbax component checkpoints must be equally portable —
save on a CPU dev box or a training pod, restore on one serving chip.
load_params(dir) therefore rebuilds its restore target from the
checkpoint's shape/dtype metadata instead of the recorded shardings
(train/checkpoint.py:load_params)."""

import json
import os

import numpy as np
import pytest

import jax

from halva_tpu.train import checkpoint as ckpt_lib
from halva_tpu.train import vila as vila_lib


def _poison_shardings(directory):
    """Rewrite every recorded device_str to a device that cannot exist
    in this process — simulating a checkpoint written on another
    platform."""
    n = 0
    for root, _dirs, files in os.walk(directory):
        for f in files:
            if f != "_sharding":
                continue
            p = os.path.join(root, f)
            d = json.load(open(p))
            for k, v in d.items():
                s = json.loads(v)
                if "device_str" in s:
                    s["device_str"] = "IMAGINARY_ACCEL_7"
                d[k] = json.dumps(s)
            json.dump(d, open(p, "w"))
            n += 1
    return n


def test_template_free_restore_ignores_saved_devices(tmp_path):
    tree = {
        "w": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)},
        "b": np.ones((5,), np.int32),
    }
    d = str(tmp_path / "ck")
    ckpt_lib.save_params(d, jax.tree.map(jax.numpy.asarray, tree))
    assert _poison_shardings(d) >= 1, "no _sharding file found to poison"

    out = ckpt_lib.load_params(d)  # template-free: must not raise
    np.testing.assert_array_equal(np.asarray(out["w"]["kernel"]),
                                  tree["w"]["kernel"])
    np.testing.assert_array_equal(np.asarray(out["b"]), tree["b"])
    assert out["b"].dtype == np.int32


def test_component_checkpoint_survives_platform_change(tmp_path):
    from halva_tpu.config import LLAVA_TINY
    from halva_tpu.models import llava

    params = llava.init_params(jax.random.PRNGKey(0), LLAVA_TINY)
    comp = str(tmp_path / "components")
    vila_lib.save_components(comp, params, LLAVA_TINY)
    assert _poison_shardings(comp) >= 1

    out = vila_lib.load_components(comp)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(out)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.shape == y.shape and x.dtype == y.dtype
