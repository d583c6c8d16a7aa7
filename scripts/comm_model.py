"""Comm-aware v5e-8 training projection (round-2 verdict item 2).

The 0.89 h v5e-8 claim divided the measured single-chip 7B step by 8
with zero accounting for collective time. This script makes the
projection comm-aware:

1. AOT-**compile** (not just lower) the REAL 7B DPA train step on an
   8-virtual-device CPU mesh with the production sharding plan, so the
   SPMD partitioner emits the actual collectives;
2. walk the optimized HLO for every all-gather / reduce-scatter /
   all-reduce / collective-permute and total their bytes per step;
3. model ICI time with a ring cost model and publish
   projected = compute + comm (no overlap)  and
   projected = max(compute, comm)           (perfect overlap),
   against the measured single-chip step time (TRAIN7B.json).

ICI model (documented assumptions, public v5e specs):
- v5e has 4 ICI links/chip on a 2D torus; marketing aggregate is
  1600 Gbit/s/chip => 50 GB/s one-way per link (4.5-5.0e10 B/s in the
  public scaling-book table).
- A ring collective along one torus axis uses the 2 links of that axis
  (bidirectional ring): ring_bw = 2 * LINK_BW one-way.
- all-gather / reduce-scatter of N full bytes over n chips:
  t = N * (n-1)/n / ring_bw;  all-reduce = 2x that.
XLA overlaps collectives with compute (latency hiding scheduler), so
the truth lies between the two published bounds; the no-overlap bound
is the honest headline.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
  python scripts/comm_model.py [--mesh 8x1 | 4x2] [--batch-per-chip 2] \\
      [--text-len 512] [--step-ms 2390]
Writes TRAIN7B_COMM.json next to TRAIN7B.json.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LINK_BW = 4.5e10  # bytes/s one-way per ICI link (public v5e figure)
RING_BW = 2 * LINK_BW  # bidirectional ring along one torus axis

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "s4": 0.5, "u4": 0.5,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> float:
    """Total bytes of an HLO shape string (handles tuples)."""
    total = 0.0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


_COLL_RE = re.compile(
    r"=\s+((?:\([^)]*\))|(?:\w+\[[\d,]*\][^ ]*))\s+"
    r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\("
)
# both replica_groups formats: explicit {{0,1},{2,3}} and iota [G,S]<=[N]
_GROUPS_LIST_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%([\w.\-]+)\s*\(")
_WHILE_RE = re.compile(r"\bwhile\(.*?body=%([\w.\-]+)")
_TRIP_RE = re.compile(r'"known_trip_count":\{"n":"(\d+)"\}')
_CALL_RE = re.compile(r"\bcall\(.*?to_apply=%([\w.\-]+)")


def parse_collectives(hlo_text: str):
    """[(op, full_bytes, group_size, exec_count)] per instruction.

    exec_count multiplies static instructions by the known trip counts
    of the while loops containing them (the per-layer weight
    all-gathers of an FSDP lax.scan appear ONCE in the HLO but run
    num_layers times per step)."""
    # 1. split into computations
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        m = _COMP_RE.match(line)
        if m:
            cur = m.group(1)
            comps[cur] = []
        elif cur is not None:
            comps[cur].append(line)

    # 2. multipliers: entry = 1; while body = trip * parent; call = parent
    entry = None
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY"):
            m = _COMP_RE.match(line)
            entry = m.group(1) if m else None
    mult = {name: 0 for name in comps}
    if entry:
        mult[entry] = 1
    for _ in range(12):  # call graph depth is shallow; iterate to fixpoint
        changed = False
        for name, lines in comps.items():
            m0 = mult.get(name, 0)
            if m0 == 0:
                continue
            for line in lines:
                wm = _WHILE_RE.search(line)
                if wm:
                    tm = _TRIP_RE.search(line)
                    trip = int(tm.group(1)) if tm else 1
                    tgt = wm.group(1)
                    new = m0 * trip
                    if mult.get(tgt, 0) < new:
                        mult[tgt] = new
                        changed = True
                cm = _CALL_RE.search(line)
                if cm:
                    tgt = cm.group(1)
                    if mult.get(tgt, 0) < m0:
                        mult[tgt] = m0
                        changed = True
        if not changed:
            break

    # 3. collect collectives with their computation's multiplier
    out = []
    for name, lines in comps.items():
        m0 = mult.get(name, 0)
        if m0 == 0:
            continue
        for line in lines:
            m = _COLL_RE.search(line)
            if not m or "-done" in line:
                continue
            shape_str, op = m.group(1), m.group(2)
            gm = _GROUPS_IOTA_RE.search(line)
            if gm:
                gsize = int(gm.group(2))
            else:
                gl = _GROUPS_LIST_RE.search(line)
                gsize = len(gl.group(1).split(",")) if gl else 0
            out.append((op, shape_bytes(shape_str), gsize, m0))
    return out


def collective_time_s(op: str, full_bytes: float, n: int) -> float:
    if n <= 1:
        return 0.0
    frac = (n - 1) / n
    if op == "all-reduce":
        return 2 * full_bytes * frac / RING_BW
    if op in ("all-gather", "reduce-scatter"):
        return full_bytes * frac / RING_BW
    if op == "collective-permute":
        return full_bytes / RING_BW
    if op == "all-to-all":
        return full_bytes * frac / RING_BW
    return 0.0


def build_and_compile(mesh_shape, batch_per_chip, text_len,
                      int8_base=False, preset="llava-v1.5-7b"):
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs("/tmp/halva_jax_cache_cpu", exist_ok=True)
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/halva_jax_cache_cpu"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from halva_tpu.config import PRESETS
    from halva_tpu.models import llava
    from halva_tpu.parallel import mesh as mesh_lib, partition
    from halva_tpu.train import lora as lora_lib, trainer as trainer_lib

    data, model = mesh_shape
    mesh = mesh_lib.make_mesh(
        data=data, model=model, devices=jax.devices()[: data * model]
    )
    cfg = PRESETS[preset]
    tcfg = trainer_lib.TrainConfig(
        grad_accum_steps=1, num_train_steps=10, attn_impl="xla",
        remat=True, loss_chunk=256,
    )
    def make_tree():
        base = llava.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        if int8_base:
            # the measured TRAIN7B recipe: int8 base + bf16 LoRA —
            # halves the FSDP all-gather bytes
            from halva_tpu.ops.quant import quantize_params

            base = quantize_params(base)
        return lora_lib.add_lora(base, jax.random.PRNGKey(1), rank=128)

    params_abs = jax.eval_shape(make_tree)
    mask = lora_lib.trainable_mask(params_abs)
    trainable_abs = jax.tree.map(
        lambda p, m: p if m else None, params_abs, mask
    )
    frozen_abs = jax.tree.map(
        lambda p, m: None if m else p, params_abs, mask
    )
    optimizer = trainer_lib.make_optimizer(tcfg, trainable_abs)
    opt_abs = jax.eval_shape(optimizer.init, trainable_abs)
    step_fn, _ = trainer_lib.dpa_step_fns(cfg, tcfg, optimizer, mesh=mesh)

    def with_sh(tree):
        return jax.tree.map(
            lambda l, sh: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=sh),
            tree,
            partition.param_shardings(tree, mesh),
        )

    b = batch_per_chip * data
    s = text_len
    bs = partition.batch_sharding(mesh)
    batch_abs = {}
    for k in (
        "input_ids", "segment_ids", "labels", "pos_signs",
        "neg_input_ids", "neg_segment_ids", "neg_labels", "neg_signs",
        "ref_input_ids", "ref_segment_ids", "ref_labels",
    ):
        batch_abs[k] = jax.ShapeDtypeStruct((b, s), jnp.int32, sharding=bs)
    for k in ("images", "ref_images"):
        batch_abs[k] = jax.ShapeDtypeStruct(
            (b, 3, cfg.vision.image_size, cfg.vision.image_size),
            jnp.float32,
            sharding=bs,
        )

    print(f"lowering {preset} step on mesh {dict(mesh.shape)} "
          f"(b={b} global, s={s})...", flush=True)
    lowered = jax.jit(step_fn).lower(
        with_sh(trainable_abs), with_sh(frozen_abs),
        None,  # ref model derives from the frozen base in-jit (zero-copy)
        with_sh(opt_abs), batch_abs,
    )
    print("compiling (SPMD partitioner emits collectives)...", flush=True)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    return compiled, mesh, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="8x1", choices=["8x1", "4x2"])
    ap.add_argument("--preset", default="llava-v1.5-7b",
                    help="model preset (llava-v1.5-13b: no single-chip "
                         "measurement exists — 13B bf16 weights exceed "
                         "one chip's 15.75G HBM; pass --step-ms scaled "
                         "from the measured 7B step by the analytic "
                         "LLM-param ratio 13.016/6.738 = 1.932 — NOT "
                         "by compiled_flops_per_step_global, which "
                         "counts lax.scan while bodies once, not "
                         "x num_layers)")
    ap.add_argument("--batch-per-chip", type=int, default=2)
    ap.add_argument("--text-len", type=int, default=512)
    ap.add_argument("--step-ms", type=float, default=2390.0,
                    help="measured (or FLOP-scaled, see --preset) "
                         "single-chip step time at this shape "
                         "(TRAIN7B.json); 0 = comm-only report, no "
                         "run-hour projection")
    ap.add_argument("--samples", type=int, default=21500)
    ap.add_argument("--int8-base", action="store_true",
                    help="model the measured recipe: int8 base weights "
                         "+ bf16 LoRA (TRAIN7B.json)")
    ap.add_argument("--out", default="TRAIN7B_COMM.json")
    args = ap.parse_args()

    data, model = (int(x) for x in args.mesh.split("x"))
    compiled, mesh, flops = build_and_compile(
        (data, model), args.batch_per_chip, args.text_len, args.int8_base,
        preset=args.preset,
    )
    hlo = compiled.as_text()
    with open(f"/tmp/comm_hlo_{args.mesh}.txt", "w") as f:
        f.write(hlo)
    colls = parse_collectives(hlo)

    per_op = {}
    comm_s = 0.0
    for op, nbytes, gsize, execs in colls:
        t = collective_time_s(op, nbytes, gsize) * execs
        comm_s += t
        slot = per_op.setdefault(
            op, {"count": 0, "bytes": 0.0, "time_ms": 0.0}
        )
        slot["count"] += execs
        slot["bytes"] += nbytes * execs
        slot["time_ms"] += t * 1e3
    for slot in per_op.values():
        slot["bytes_gb"] = round(slot.pop("bytes") / 1e9, 3)
        slot["time_ms"] = round(slot["time_ms"], 2)

    compute_s = args.step_ms / 1e3
    no_overlap = compute_s + comm_s
    full_overlap = max(compute_s, comm_s)
    global_batch = args.batch_per_chip * data
    steps = args.samples / global_batch
    out = {
        "preset": args.preset,
        "mesh": dict(mesh.shape),
        "batch_per_chip": args.batch_per_chip,
        "int8_base": args.int8_base,
        "text_len": args.text_len,
        "measured_single_chip_step_ms": args.step_ms,
        "compiled_flops_per_step_global": flops,
        "per_chip_flops": flops / (data * model) if flops else 0.0,
        "collectives": per_op,
        "comm_ms_per_step_no_overlap": round(comm_s * 1e3, 1),
        "ici_model": {
            "link_bw_one_way_B_per_s": LINK_BW,
            "ring_bw_B_per_s": RING_BW,
            "note": "v5e 2D torus, ring collectives along one axis "
                    "using both directions; all-reduce = 2x "
                    "(n-1)/n * bytes / ring_bw",
        },
        "projected_step_ms_no_overlap": (
            round(no_overlap * 1e3, 1) if args.step_ms else None
        ),
        "projected_step_ms_full_overlap": (
            round(full_overlap * 1e3, 1) if args.step_ms else None
        ),
        "run_hours_no_overlap": (
            round(steps * no_overlap / 3600, 3) if args.step_ms else None
        ),
        "run_hours_full_overlap": (
            round(steps * full_overlap / 3600, 3) if args.step_ms else None
        ),
        # BASELINE.md: 7B 1.5 h / 13B 3 h on 4xA100 (README.md:95)
        "reference_headline_hours": (
            3.0 if "13b" in args.preset else 1.5
        ),
        "samples": args.samples,
        "global_batch": global_batch,
    }
    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
