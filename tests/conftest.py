"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding paths (FSDP/TP over Mesh) are validated on virtual CPU
devices per SURVEY.md §4 — no TPU slice is needed for unit tests.

Note: plugins (jaxtyping) may import jax before this conftest runs, so env
vars alone are too late; jax.config.update works until the backend is
actually initialized.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

import jax

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls for parity tests
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
