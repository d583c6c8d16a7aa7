"""Device mesh construction over ICI.

Replaces the reference's DeepSpeed/NCCL process topology (rank-per-GPU via
`deepspeed` launcher, src/hallava_7b.sh:30) with a jax.sharding.Mesh. Axes:

- "data": batch + FSDP parameter sharding (ZeRO-3 equivalent — the
  reference's src/json/zero3.json).
- "model": tensor parallelism (absent in the reference; added for 13B+
  on small-HBM chips, SURVEY.md §2.5).

All collectives are emitted by XLA from sharding annotations; no explicit
NCCL-style calls anywhere in the framework.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
AXIS_NAMES = (DATA_AXIS, MODEL_AXIS)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. data=None uses all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, AXIS_NAMES)


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])
