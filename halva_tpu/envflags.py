"""Process-env TPU compiler flags. MUST run before `import jax` (the
axon compile helper snapshots LIBTPU_INIT_ARGS at PJRT plugin init).

This module deliberately imports nothing heavy so entry points can call
it first thing.
"""

import os


def apply_tpu_env_flags() -> None:
    """Translate HALVA_* knobs into libtpu flags (idempotent).

    HALVA_SCOPED_VMEM_MB: raise the scoped-VMEM compile budget
    (--xla_tpu_scoped_vmem_limit_kib). The fused decode kernel keys its
    multi-row grid packing (HALVA_DECODE_ROWS) off the same variable —
    set both together: ops/decode_attention.py sizes its blocks under
    this budget, and compiles will fail with "exceeded scoped vmem
    limit" if the flag did not actually reach the compiler
    (scripts/probe_rows_decode.py is the on-chip check).
    """
    mb = os.environ.get("HALVA_SCOPED_VMEM_MB")
    if not mb:
        return
    flag = f"--xla_tpu_scoped_vmem_limit_kib={int(mb) * 1024}"
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if flag not in cur:
        os.environ["LIBTPU_INIT_ARGS"] = (cur + " " + flag).strip()
