"""Pallas W4 (4-bit weight-only) matmul over stacked per-layer weights.

Serving-decode kernel: llava-7b decode at b24 is weight-bandwidth-bound
(scripts/profile_decode.py: 8.3 ms/step with attention stubbed ~= the
6.7 GB int8 weight read at HBM speed). int8 is already at its byte
floor through XLA (slice+convert+dot fuse), so halving weight bytes
requires 4-bit storage — and a Pallas kernel, because an XLA dot over
4-bit weights materializes the bf16 dequant copy (the same trap
measured for the int8 KV cache). Like ops/decode_attention.py, the
layer index rides a scalar-prefetch argument so the kernel streams
blocks straight from the stacked arrays with no per-layer XLA slice.

Storage: TWO int4 values packed per int8 byte. The native jnp.int4
dtype is avoided deliberately — on the axon relay platform a
device_put/relayout of an int4 array recurses into the dispatcher
(RecursionError) the moment a jit executable wants a layout change.
Packing is split-half, not interleaved: byte[k, j] holds weight
[k, j] in its LOW nibble and weight [k, j + N/2] in its HIGH nibble, so
the kernel unpacks with two shifts into two independent (K, N/2)
operands and never shuffles lanes. Quantization is symmetric
per-output-channel (scale = absmax/7, values in [-7, 7]) — the
MXU/VPU-friendly counterpart of the reference's bitsandbytes 4-bit
serving surface (train_halva.py:1036-1052); the NF4 code-value variant
lives in ops/quant.py (XLA path, used for QLoRA training where the
dequant copy amortizes over a 2048-token forward).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_NP = 256  # packed columns per block (= 512 output channels)


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def quantize_kernel_int4_stacked(
    w: jnp.ndarray, group_size: int | None = None, tp: int = 1
) -> Dict[str, jnp.ndarray]:
    """(L, K, N) float -> {kernel_q4p (L, K, N/2) int8 (packed nibble
    pair), kernel_scale4p (L, 2, G, N/2) bf16 scales (index 0: channels
    [0, N/2), index 1: channels [N/2, N))}.

    group_size=None: one scale per output channel over the whole K dim
    (G=1, the round-2 serving layout). group_size=g: sub-channel scales,
    one per g input rows (G=K/g) — absmax over 128 rows of a Gaussian
    kernel sits ~22% lower than over 4096, cutting quantization error
    the same amount (and more on real outlier-heavy checkpoints) for
    +2/g bytes-per-weight of scale traffic.

    tp>1: TENSOR-PARALLEL packing — the nibble pairing (c, c+N/2)
    interleaves output channels across the packed dim, so a positional
    shard slice of a tp=1 layout would permute heads. Instead each of
    the tp column blocks W[:, :, i*N/tp:(i+1)*N/tp] is packed
    independently and the results concatenated: a contiguous 1/tp slice
    of the packed dim is then a self-consistent packed kernel of its
    channel block, exactly what jax.shard_map in_specs hand each model
    shard (parallel/partition.eval_shmap_pspecs)."""
    if tp > 1:
        L, k, n = w.shape
        assert n % (2 * tp) == 0, (n, tp)
        blocks = [
            quantize_kernel_int4_stacked(
                w[:, :, i * (n // tp) : (i + 1) * (n // tp)],
                group_size=group_size,
            )
            for i in range(tp)
        ]
        return {
            "kernel_q4p": jnp.concatenate(
                [b_["kernel_q4p"] for b_ in blocks], axis=-1
            ),
            "kernel_scale4p": jnp.concatenate(
                [b_["kernel_scale4p"] for b_ in blocks], axis=-1
            ),
        }
    L, k, n = w.shape
    assert n % 2 == 0, n
    g = k if group_size is None else group_size
    assert k % g == 0, (k, g)
    w32 = jnp.asarray(w, jnp.float32).reshape(L, k // g, g, n)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)  # (L,G,1,N)
    scale = jnp.where(absmax == 0.0, 1.0, absmax / 7.0)
    q = (
        jnp.clip(jnp.round(w32 / scale), -7, 7)
        .astype(jnp.int32)
        .reshape(L, k, n)
    )
    lo = q[:, :, : n // 2] & 0xF
    hi = q[:, :, n // 2 :] & 0xF
    packed = (hi << 4) | lo  # 0..255
    packed_i8 = (packed - 256 * (packed > 127)).astype(jnp.int8)
    # (L, G, 1, N) -> (L, 2, G, N/2): [:, h] scales channel half h
    s = scale.reshape(L, k // g, 2, n // 2).transpose(0, 2, 1, 3)
    return {
        "kernel_q4p": packed_i8,
        "kernel_scale4p": s.astype(jnp.bfloat16),
    }


def quantize_kernel_int4_stacked_host(
    w, group_size: int | None = None, tp: int = 1
) -> Dict[str, "jnp.ndarray"]:
    """Numpy twin of quantize_kernel_int4_stacked — host RAM only (the
    axon relay never frees device HBM, so serving conversion must not
    stage bf16 weights on device; see quant.quantize_params_host)."""
    import numpy as np

    w32 = np.asarray(w, np.float32)
    L, k, n = w32.shape
    if tp > 1:
        assert n % (2 * tp) == 0, (n, tp)
        blocks = [
            quantize_kernel_int4_stacked_host(
                w32[:, :, i * (n // tp) : (i + 1) * (n // tp)],
                group_size=group_size,
            )
            for i in range(tp)
        ]
        return {
            "kernel_q4p": np.concatenate(
                [b_["kernel_q4p"] for b_ in blocks], axis=-1
            ),
            "kernel_scale4p": np.concatenate(
                [np.asarray(b_["kernel_scale4p"]) for b_ in blocks],
                axis=-1,
            ).astype(jnp.bfloat16),
        }
    assert n % 2 == 0, n
    g = k if group_size is None else group_size
    assert k % g == 0, (k, g)
    w32 = w32.reshape(L, k // g, g, n)
    absmax = np.max(np.abs(w32), axis=-2, keepdims=True)
    scale = np.where(absmax == 0.0, 1.0, absmax / 7.0)
    q = (
        np.clip(np.round(w32 / scale), -7, 7)
        .astype(np.int32)
        .reshape(L, k, n)
    )
    lo = q[:, :, : n // 2] & 0xF
    hi = q[:, :, n // 2 :] & 0xF
    packed = (hi << 4) | lo
    packed_i8 = (packed - 256 * (packed > 127)).astype(np.int8)
    s = scale.reshape(L, k // g, 2, n // 2).transpose(0, 2, 1, 3)
    return {
        "kernel_q4p": packed_i8,
        "kernel_scale4p": s.astype(jnp.bfloat16),
    }


def quantize_params_int4_host(
    params, group_size: int | None = None, tp: int = 1
):
    """Serving W4 conversion on HOST: every stacked 3D kernel (the LLM
    and vision layer stacks) drops to packed int4; 2D kernels and embed
    tables get per-channel int8 (quant.quantize_params_host). This is
    the bench.py headline configuration, reachable from
    models/builder.load_pretrained_model(quant="int4"); group_size=128
    (quant="int4g") adds sub-channel scales for lower quantization
    error. Stacks whose K dim the group size does not divide keep
    per-channel scales.

    tp>1: pack the LLM's column-split kernels (wq/wk/wv/gate/up)
    shard-consistently for a tp-way manual-TP mesh (see
    quantize_kernel_int4_stacked) and stamp the tree with
    "w4_pack_tp" so partition.manual_tp_ready can verify the packing
    matches the mesh's model axis. Row-split (wo/down) and vision
    kernels keep the plain layout (their packed dim is never sharded)."""
    import numpy as np

    from halva_tpu.ops.quant import quantize_params_host

    N_SPLIT_KEYS = {"wq", "wk", "wv", "gate", "up"}

    def rewrite(node, path=()):
        if isinstance(node, dict):
            k3 = node.get("kernel")
            if k3 is not None and getattr(k3, "ndim", 0) == 3:
                g = group_size
                if g is not None and k3.shape[1] % g != 0:
                    g = None
                kt = (
                    tp
                    if (
                        tp > 1
                        and path
                        and path[0] == "llm"
                        and path[-1] in N_SPLIT_KEYS
                    )
                    else 1
                )
                # SIBLING LEAVES SURVIVE: real CLIP/SigLIP stacks carry
                # per-layer biases next to the kernel (convert_hf) and
                # dense() adds them only if present — an early version
                # returned just the packed dict and silently served the
                # vision tower bias-free
                out = {k: v for k, v in node.items() if k != "kernel"}
                out.update(
                    quantize_kernel_int4_stacked_host(
                        k3, group_size=g, tp=kt
                    )
                )
                return out
            return {k: rewrite(v, path + (k,)) for k, v in node.items()}
        return node

    # int4 first (3D stacks, siblings kept), THEN one int8 pass for what
    # remains (2D kernels, embeds) — the int4 nodes no longer carry a
    # "kernel" key so quantize_params_host leaves them alone, and the
    # stacked weights are never pointlessly int8-quantized first
    out = quantize_params_host(rewrite(params))
    if tp > 1:
        out["w4_pack_tp"] = np.int32(tp)
    return out


def unpack_int4(p: jnp.ndarray):
    """int8 packed byte -> (lo, hi) sign-extended int32 nibbles.

    Shifts run in int32: Mosaic does not legalize arith.shli on int8
    vectors (measured: 'failed to legalize operation arith.shli'), and
    numpy-semantics right_shift on signed int32 is arithmetic."""
    p32 = p.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)
    return lo, hi


def w4a8_dense(x: jnp.ndarray, kernel_q4p: jnp.ndarray,
               kernel_scale4p: jnp.ndarray) -> jnp.ndarray:
    """W4A8 prefill matmul: unpack int4 nibbles to int8 and run the
    s8 x s8 -> s32 MXU mode (2x bf16 peak on v5e) with dynamic
    per-token int8 activations (same activation scheme as
    quant.int8_dense).

    The default int4 prefill branch (models/llama.py dense) dequantizes
    to bf16 and runs the MXU at the bf16 rate — measured at ~peak for
    llava-7b b56 prefill (4.06 s of a 7.7 s generate), so the int8 MXU
    rate is the only remaining lever. The int4->int8 unpack is O(K*N/2)
    int32 VPU work that XLA fuses into the dot's operand pipeline, and
    both weight scales fold into the rows x out output rescale.

    Gated by HALVA_W4A8 (quant.w4a8_enabled), default OFF until the
    chip measurement lands (see STATUS.md round-3 table). Decode is
    untouched either way (the Pallas W4 GEMV path) — only the prompt
    pass (and therefore the first sampled token) changes numerics,
    bounded by tests/test_w4.py::test_w4a8_matches_dequant_branch.

    Grouped-K scales (kernel_scale4p G > 1, the int4g serving
    quantizer): a per-channel scale cannot fold past the int32 dot, so
    the dot runs as G batched s8 x s8 -> s32 dots of K/G rows each
    (same MAC count, the MXU tiles the K dim either way) and each
    group's weight scale folds into its partial accumulator before the
    group sum. Activations keep ONE per-token int8 scale over the full
    K (the flat-W4A8 scheme) — round-5 addition so the quality-clean
    int4g default keeps the int8-MXU prefill rate
    (QUANT_QUALITY_v2.json: flat int4 first_token_agreement 0.9688 at
    n=32 vs int4g 1.0)."""
    ng = kernel_scale4p.shape[1]
    lo, hi = unpack_int4(kernel_q4p)
    wq = jnp.concatenate(
        [lo.astype(jnp.int8), hi.astype(jnp.int8)], axis=-1
    )  # (K, N), values in [-8, 7]
    sw = jnp.concatenate(
        [kernel_scale4p[0], kernel_scale4p[1]], axis=-1
    ).astype(jnp.float32)  # (G, N)
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    if ng == 1:
        acc = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * sx * sw
        return y.astype(x.dtype)
    k, n = wq.shape
    gs = k // ng
    lead = xq.shape[:-1]
    x2 = xq.reshape((-1, k))
    m = x2.shape[0]

    # one f32 (M, N) accumulator, G sequential int8 dots of gs K-rows
    # each with the group's weight scale folded in before the add — a
    # single batched dot with a G dimension would materialize a
    # (G, M, N) int32 accumulator (terabytes at 7B prefill shapes)
    def body(g, acc):
        xs = jax.lax.dynamic_slice_in_dim(x2, g * gs, gs, axis=1)
        ws = jax.lax.dynamic_slice_in_dim(wq, g * gs, gs, axis=0)
        d = jax.lax.dot_general(
            xs, ws, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        swg = jax.lax.dynamic_index_in_dim(sw, g, 0, False)  # (N,)
        return acc + d.astype(jnp.float32) * swg[None, :]

    acc = jax.lax.fori_loop(
        0, ng, body, jnp.zeros((m, n), jnp.float32)
    )
    y = acc.reshape(lead + (n,)) * sx
    return y.astype(x.dtype)


def _w4_kernel(
    li_ref,  # (1,) int32 scalar prefetch
    x_ref,  # (B, K) bf16
    w_ref,  # (1, K, bnp) int8 packed
    s_ref,  # (1, 2, G, bnp) bf16 (G=1: per-output-channel)
    o_ref,  # (2, B, bnp) — [0]: low-half channels, [1]: high-half
):
    del li_ref
    x = x_ref[...]
    lo, hi = unpack_int4(w_ref[0])
    s = s_ref[0].astype(jnp.float32)  # (2, G, bnp)
    ng = s.shape[1]
    if ng == 1:
        # per-channel scales fold into the dot OUTPUT (cheapest)
        y_lo = jnp.dot(
            x, lo.astype(x.dtype), preferred_element_type=jnp.float32
        ) * s[0]
        y_hi = jnp.dot(
            x, hi.astype(x.dtype), preferred_element_type=jnp.float32
        ) * s[1]
    else:
        # sub-channel (grouped-K) scales: expand each (G, bnp) scale
        # plane to (K, bnp) along the sublane-major dims (lane dim bnp
        # untouched — Mosaic-legal broadcast + major-dim merge) and
        # scale the weights before the bf16 dot. The extra multiply is
        # VPU work the HBM-bound stream absorbs.
        k, bnp = lo.shape
        gs = k // ng

        def expand(plane):  # (G, bnp) -> (K, bnp)
            return jnp.reshape(
                jnp.broadcast_to(plane[:, None, :], (ng, gs, bnp)),
                (k, bnp),
            )

        y_lo = jnp.dot(
            x,
            (lo.astype(jnp.float32) * expand(s[0])).astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        y_hi = jnp.dot(
            x,
            (hi.astype(jnp.float32) * expand(s[1])).astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = y_lo.astype(o_ref.dtype)
    o_ref[1] = y_hi.astype(o_ref.dtype)


def w4_dense_stacked(
    x: jnp.ndarray,  # (B, K) bf16
    stacked: Dict[str, jnp.ndarray],  # kernel_q4p (L,K,N/2) + scales
    layer: jnp.ndarray,  # () int32
    block_np: int = DEFAULT_BLOCK_NP,
) -> jnp.ndarray:
    """y = x @ dequant(W4[layer]) — streams packed int4 blocks of the
    stacked weights (no per-layer slice materialization)."""
    w = stacked["kernel_q4p"]
    L, k, np_ = w.shape
    ng = stacked["kernel_scale4p"].shape[2]  # 1 = per-channel
    b = x.shape[0]
    bnp = min(block_np, np_)
    # np_ need not divide bnp (e.g. MLP intermediate 11008 -> 5504): the
    # last output block is clipped on write; out-of-bounds input garbage
    # only feeds the clipped region
    nb = pl.cdiv(np_, bnp)

    out = pl.pallas_call(
        _w4_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((b, k), lambda ni, li: (0, 0)),
                pl.BlockSpec((1, k, bnp), lambda ni, li: (li[0], 0, ni)),
                pl.BlockSpec(
                    (1, 2, ng, bnp), lambda ni, li: (li[0], 0, 0, ni)
                ),
            ],
            out_specs=pl.BlockSpec((2, b, bnp), lambda ni, li: (0, 0, ni)),
        ),
        out_shape=jax.ShapeDtypeStruct((2, b, np_), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_interp(),
    )(
        jnp.reshape(layer.astype(jnp.int32), (1,)),
        x,
        w,
        stacked["kernel_scale4p"],
    )
    return jnp.concatenate([out[0], out[1]], axis=-1)  # (B, N)


def w4_gemm(
    x: jnp.ndarray,  # (..., K) bf16/f32 activations (prefill M rows)
    kernel_q4p: jnp.ndarray,  # (K, N/2) packed int4
    kernel_scale4p: jnp.ndarray,  # (2, G, N/2)
    block_m: int = 256,
    block_np: int = DEFAULT_BLOCK_NP,
) -> jnp.ndarray:
    """Prefill GEMM over packed-int4 weights: the M-blocked
    generalization of the decode GEMV (_w4_kernel — same in-VMEM
    nibble unpack, grouped-scale expand, and half-split dots), so HBM
    streams only the packed int4 bytes and the dot runs the full-K
    bf16 MXU rate. Built because the grouped-K prefill otherwise loses
    either way at 7B shapes (M=4096, K=11008, N=4096 microbench,
    real v5e): the XLA dequant branch materializes a bf16 weight copy
    through HBM (72.5 TF/s) and the fori_loop grouped W4A8 pays
    128-deep MXU dots (56.3 TF/s). Flat (G=1) trees keep the
    per-channel W4A8 int8-MXU path (93.3 TF/s) — this kernel is the
    grouped-K answer.

    Off-TPU falls back to the XLA dequant branch (numerics twin).

    Differentiable wrt x (training forwards on a frozen int4 base need
    the activation gradient THROUGH the frozen dense — the LoRA params
    upstream depend on it): custom VJP with dx = g @ dequant(W)^T, the
    same materialize-for-backward convention as quant.w8_dense. The
    packed weights themselves are non-differentiable.

    TRACED weights (e.g. a lax.scan over stacked layers) cannot ride
    the custom-VJP closure (the residual would leak the tracer —
    measured as the r5e qt_int4 UnexpectedTracerError): those callers
    get the XLA dequant math, which is fully differentiable and is the
    in-model routing anyway (models/llama.dense)."""

    def _dequant(dt):
        lo, hi = unpack_int4(kernel_q4p)
        s = kernel_scale4p.astype(dt)
        if kernel_scale4p.shape[1] > 1:
            s = jnp.repeat(
                s, kernel_q4p.shape[0] // kernel_scale4p.shape[1], axis=1
            )
        return jnp.concatenate(
            [lo.astype(dt) * s[0], hi.astype(dt) * s[1]], axis=-1
        )

    if isinstance(kernel_q4p, jax.core.Tracer) or isinstance(
        kernel_scale4p, jax.core.Tracer
    ):
        lead = x.shape[:-1]
        return jnp.dot(
            x.reshape(-1, x.shape[-1]), _dequant(x.dtype)
        ).reshape(*lead, 2 * kernel_q4p.shape[1])

    @jax.custom_vjp
    def f(x):
        return _w4_gemm_impl(
            x, kernel_q4p, kernel_scale4p, block_m, block_np, _dequant
        )

    def fwd(x):
        return f(x), None

    def bwd(_, g):
        wd = _dequant(g.dtype)
        return (jnp.dot(g, wd.T),)

    f.defvjp(fwd, bwd)
    return f(x)


def _w4_gemm_impl(x, kernel_q4p, kernel_scale4p, block_m, block_np,
                  dequant):
    lead = x.shape[:-1]
    k = x.shape[-1]
    np_ = kernel_q4p.shape[1]
    ng = kernel_scale4p.shape[1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    if jax.default_backend() != "tpu" or _interp():
        return jnp.dot(x2, dequant(x.dtype)).reshape(*lead, 2 * np_)

    # block plan under the scoped-VMEM compile budget: double-buffered
    # x (bm, K) bf16 + packed w (K, bnp) int8 blocks, plus the
    # in-kernel unpack/scale temps (~(4+4+2)·K·bnp per half when
    # grouped — int32 nibble planes + the expanded f32 scale plane;
    # measured 19.3M at bm=128, bnp=256, K=11008 under the default
    # 16MB limit). Entry points raise the budget via
    # HALVA_SCOPED_VMEM_MB (halva_tpu/envflags.py).
    vmem = int(os.environ.get("HALVA_SCOPED_VMEM_MB", "16")) * 2**20
    bnp = min(block_np, np_)
    bm = min(block_m, max(8, m))
    temp_per = (8 + (4 if ng > 1 else 0))

    def stack_est(bm_, bnp_):
        return (
            2 * bm_ * k * x2.dtype.itemsize
            + 2 * k * bnp_
            + temp_per * k * bnp_
            + 2 * 2 * bm_ * bnp_ * x2.dtype.itemsize
        )

    while bm > 8 and stack_est(bm, bnp) > vmem - 2 * 2**20:
        bm //= 2
    while bnp > 128 and stack_est(bm, bnp) > vmem - 2 * 2**20:
        bnp //= 2
    nb = pl.cdiv(np_, bnp)
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    mp = x2.shape[0]

    out = pl.pallas_call(
        _w4_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mp // bm, nb),
            in_specs=[
                pl.BlockSpec((bm, k), lambda mi, ni, li: (mi, 0)),
                pl.BlockSpec(
                    (1, k, bnp), lambda mi, ni, li: (0, 0, ni)
                ),
                pl.BlockSpec(
                    (1, 2, ng, bnp), lambda mi, ni, li: (0, 0, 0, ni)
                ),
            ],
            out_specs=pl.BlockSpec(
                (2, bm, bnp), lambda mi, ni, li: (0, mi, ni)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((2, mp, np_), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interp(),
    )(
        jnp.zeros((1,), jnp.int32),
        x2,
        kernel_q4p[None],
        kernel_scale4p[None],
    )
    y = jnp.concatenate([out[0], out[1]], axis=-1)[:m]
    return y.reshape(*lead, 2 * np_)
