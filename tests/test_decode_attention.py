"""Fused Pallas decode attention (ops/decode_attention.py) vs the XLA
oracle (models/llama.py:_decode_attend), interpret mode on CPU: bf16 and
int8-quantized stacked prompt caches, layer-index scalar prefetch,
non-block-aligned Sp, padded prompts, partially-filled generated cache."""

import numpy as np

import jax
import jax.numpy as jnp

from halva_tpu.models.llama import _decode_attend, _quantize_kv
from halva_tpu.ops.decode_attention import decode_attend_layer


def _setup(seed=0, layers=3, b=2, sp=300, h=8, d=64, sg=16):
    rng = np.random.RandomState(seed)

    def t(*shape):
        return jnp.asarray(rng.randn(*shape), jnp.float32).astype(
            jnp.bfloat16
        )

    q = t(b, 1, h, d)
    # stacked head-major caches (L, B, H, S, D), as prefill/init_gen emit
    kp, vp = t(layers, b, h, sp, d), t(layers, b, h, sp, d)
    kg, vg = t(layers, b, h, sg, d), t(layers, b, h, sg, d)
    seg = np.ones((b, sp), np.int32)
    seg[0, 250:] = 0
    seg[1, 100:] = 0
    seg = jnp.asarray(seg)
    gv = jnp.asarray(
        np.arange(sg)[None, :] <= np.array([3, 7, 0])[:b, None]
    )
    return q, kp, vp, kg, vg, seg, gv


def _oracle(q, kp, vp, kg, vg, seg, gv, li, quant):
    kpl, vpl, kgl, vgl = kp[li], vp[li], kg[li], vg[li]
    if quant:
        kq, ks = _quantize_kv(kpl)
        vq, vs = _quantize_kv(vpl)
        return _decode_attend(
            q, kq, vq, kgl, vgl, seg, gv, kp_scale=ks, vp_scale=vs
        )
    return _decode_attend(q, kpl, vpl, kgl, vgl, seg, gv)


def _assert_close(got, want, atol=6e-3):
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        atol=atol,
    )


def test_fused_matches_oracle_bf16_every_layer():
    q, kp, vp, kg, vg, seg, gv = _setup()
    cache = {"k": kp, "v": vp}
    for li in range(kp.shape[0]):
        got = decode_attend_layer(
            q, cache, seg, {"k": kg, "v": vg}, gv, jnp.int32(li)
        )
        want = _oracle(q, kp, vp, kg, vg, seg, gv, li, quant=False)
        _assert_close(got, want)


def test_fused_matches_oracle_int8():
    q, kp, vp, kg, vg, seg, gv = _setup(seed=1)
    kq, ks = _quantize_kv(kp)
    vq, vs = _quantize_kv(vp)
    cache = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}
    for li in (0, 2):
        got = decode_attend_layer(
            q, cache, seg, {"k": kg, "v": vg}, gv, jnp.int32(li)
        )
        want = _decode_attend(
            q, kq[li], vq[li], kg[li], vg[li], seg, gv,
            kp_scale=ks[li], vp_scale=vs[li],
        )
        _assert_close(got, want)


def test_fused_non_aligned_and_short_prompt():
    """Sp below one block, at a block multiple, and non-128-aligned."""
    for sp in (130, 256, 300):
        q, kp, vp, kg, vg, seg, gv = _setup(seed=2, sp=sp, layers=2)
        got = decode_attend_layer(
            q, {"k": kp, "v": vp}, seg, {"k": kg, "v": vg}, gv, jnp.int32(1)
        )
        want = _oracle(q, kp, vp, kg, vg, seg, gv, 1, quant=False)
        _assert_close(got, want)


def test_fused_single_gen_slot():
    """Step 0: only gen slot 0 valid on every row."""
    q, kp, vp, kg, vg, seg, _ = _setup(seed=3, layers=2)
    gv = jnp.asarray(np.arange(16)[None, :] <= 0) & jnp.ones(
        (2, 1), bool
    )
    got = decode_attend_layer(
        q, {"k": kp, "v": vp}, seg, {"k": kg, "v": vg}, gv, jnp.int32(0)
    )
    want = _oracle(q, kp, vp, kg, vg, seg, gv, 0, quant=False)
    _assert_close(got, want)


def test_fused_inside_scan():
    """The production shape: called once per layer inside lax.scan with
    the traced layer counter as the scalar-prefetch index."""
    q, kp, vp, kg, vg, seg, gv = _setup(seed=4, layers=3)
    cache = {"k": kp, "v": vp}

    def body(li, _):
        return li + 1, decode_attend_layer(
            q, cache, seg, {"k": kg, "v": vg}, gv, li
        )

    _, outs = jax.lax.scan(body, jnp.int32(0), None, length=3)
    for li in range(3):
        want = _oracle(q, kp, vp, kg, vg, seg, gv, li, quant=False)
        _assert_close(outs[li], want)


def test_fused_int8_gen_cache():
    """Quantized generated cache (int8 values + per-(head, slot) scales)
    through the kernel vs the oracle with the same quantized gen."""
    q, kp, vp, kg, vg, seg, gv = _setup(seed=5)
    kq, ks = _quantize_kv(kp)
    vq, vs = _quantize_kv(vp)
    gkq, gks = _quantize_kv(kg)
    gvq, gvs = _quantize_kv(vg)
    pc = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}
    gc = {"k": gkq, "v": gvq, "k_scale": gks, "v_scale": gvs}
    for li in (0, 2):
        got = decode_attend_layer(q, pc, seg, gc, gv, jnp.int32(li))
        want = _decode_attend(
            q, kq[li], vq[li], gkq[li], gvq[li], seg, gv,
            kp_scale=ks[li], vp_scale=vs[li],
            kg_scale=gks[li], vg_scale=gvs[li],
        )
        _assert_close(got, want)


def _setup_gqa(seed=0, layers=2, b=2, sp=300, h=8, kvh=2, d=64, sg=16):
    rng = np.random.RandomState(seed)

    def t(*shape):
        return jnp.asarray(rng.randn(*shape), jnp.float32).astype(
            jnp.bfloat16
        )

    q = t(b, 1, h, d)
    kp, vp = t(layers, b, kvh, sp, d), t(layers, b, kvh, sp, d)
    kg, vg = t(layers, b, kvh, sg, d), t(layers, b, kvh, sg, d)
    seg = np.ones((b, sp), np.int32)
    seg[0, 250:] = 0
    seg[1, 100:] = 0
    gv = jnp.asarray(
        np.arange(sg)[None, :] <= np.array([3, 7, 0])[:b, None]
    )
    return q, kp, vp, kg, vg, jnp.asarray(seg), gv


def test_fused_gqa_matches_oracle_bf16():
    """GQA (kvh < h): the kernel runs G query rows per kv head against
    the true KVH-sized caches; the oracle already folds q to
    (B, KVH, G, Dh)."""
    q, kp, vp, kg, vg, seg, gv = _setup_gqa()
    for li in range(kp.shape[0]):
        got = decode_attend_layer(
            q, {"k": kp, "v": vp}, seg,
            {"k": kg, "v": vg}, gv, jnp.int32(li),
        )
        want = _oracle(q, kp, vp, kg, vg, seg, gv, li, quant=False)
        _assert_close(got, want)


def test_fused_gqa_matches_oracle_int8():
    q, kp, vp, kg, vg, seg, gv = _setup_gqa(seed=4, h=8, kvh=4)
    L = kp.shape[0]
    ks = []
    for li in range(L):
        kq, s1 = _quantize_kv(kp[li])
        vq, s2 = _quantize_kv(vp[li])
        ks.append((kq, vq, s1, s2))
    pc = {
        "k": jnp.stack([x[0] for x in ks]),
        "v": jnp.stack([x[1] for x in ks]),
        "k_scale": jnp.stack([x[2] for x in ks]),
        "v_scale": jnp.stack([x[3] for x in ks]),
    }
    for li in range(L):
        got = decode_attend_layer(
            q, pc, seg, {"k": kg, "v": vg}, gv, jnp.int32(li),
        )
        want = _decode_attend(
            q, pc["k"][li], pc["v"][li], kg[li], vg[li], seg, gv,
            kp_scale=pc["k_scale"][li], vp_scale=pc["v_scale"][li],
        )
        _assert_close(got, want)


def test_fused_beam_k_shared_prompt_rows():
    """beam_k > 1: q/gen carry B*K rows while the prompt operands stay
    at B item rows (ops/beam.py never duplicates the prompt cache). The
    kernel's bi // beam_k index maps must reproduce the beam_k=1 kernel
    run over an explicitly repeated prompt cache, bf16 and int8."""
    k = 3
    q, kp, vp, kg, vg, seg, gv = _setup(seed=5, b=2, sg=16)
    b = 2
    rng = np.random.RandomState(9)
    qk = jnp.asarray(
        rng.randn(b * k, 1, q.shape[2], q.shape[3]), jnp.float32
    ).astype(jnp.bfloat16)
    kgk = jnp.repeat(kg, k, axis=1)  # per-beam gen caches (distinct ok)
    vgk = jnp.repeat(vg, k, axis=1) * 1.5
    gvk = jnp.repeat(gv, k, axis=0)

    for quant in (False, True):
        if quant:
            kq, ks = _quantize_kv(kp)
            vq, vs = _quantize_kv(vp)
            cache = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}
            cache_rep = {
                kk: jnp.repeat(vv, k, axis=1) for kk, vv in cache.items()
            }
        else:
            cache = {"k": kp, "v": vp}
            cache_rep = {
                kk: jnp.repeat(vv, k, axis=1) for kk, vv in cache.items()
            }
        for li in (0, 2):
            got = decode_attend_layer(
                qk, cache, seg, {"k": kgk, "v": vgk}, gvk,
                jnp.int32(li), beam_k=k,
            )
            want = decode_attend_layer(
                qk, cache_rep, jnp.repeat(seg, k, axis=0),
                {"k": kgk, "v": vgk}, gvk, jnp.int32(li),
            )
            _assert_close(got, want)


def test_oracle_beam_k_matches_repeated():
    """XLA oracle beam fold (llama._decode_attend beam_k): identical to
    running the oracle over an explicitly repeated prompt."""
    k = 2
    q, kp, vp, kg, vg, seg, gv = _setup(seed=6, b=2, sg=8)
    b, h, d = 2, q.shape[2], q.shape[3]
    rng = np.random.RandomState(10)
    qk = jnp.asarray(rng.randn(b * k, 1, h, d), jnp.float32).astype(
        jnp.bfloat16
    )
    kgk, vgk = jnp.repeat(kg, k, axis=1), jnp.repeat(vg, k, axis=1)
    gvk = jnp.repeat(gv, k, axis=0)
    li = 1
    kq, ks = _quantize_kv(kp[li])
    vq, vs = _quantize_kv(vp[li])
    # jit: CPU eager dispatch rejects bf16 x bf16 -> f32 dots; the
    # production path always runs this body inside one jit program
    got = jax.jit(
        lambda: _decode_attend(
            qk, kq, vq, kgk[li], vgk[li], seg, gvk,
            kp_scale=ks, vp_scale=vs, beam_k=k,
        )
    )()
    want = jax.jit(
        lambda: _decode_attend(
            qk,
            jnp.repeat(kq, k, axis=0), jnp.repeat(vq, k, axis=0),
            kgk[li], vgk[li], jnp.repeat(seg, k, axis=0), gvk,
            kp_scale=jnp.repeat(ks, k, axis=0),
            vp_scale=jnp.repeat(vs, k, axis=0),
        )
    )()
    _assert_close(got, want, atol=1e-5)


def test_fold_matches_grid_beams(monkeypatch):
    """Beams folded into the batched dot's row dimension
    (fold_attend_layer / HALVA_BEAM_DOT=fold) must reproduce the
    beam-grid kernel row-for-row: identical block sequence and merge
    order, only the dot batches K query rows — the only tolerated
    difference is dot-reduction-order rounding (<= 1 bf16 ulp; the
    fatter lhs changes the BLAS/MXU accumulation tiling). bf16 / int8 /
    int4 prompt caches, int8 gen, GQA."""
    from halva_tpu.models.llama import _quantize_kv4

    k = 4
    for h, kvh, quant in (
        (8, 8, "bf16"), (8, 8, "int8"), (8, 8, "int4"),
        (8, 2, "bf16"), (8, 4, "int8"),
    ):
        q, kp, vp, kg, vg, seg, gv = _setup_gqa(
            seed=11, b=2, h=h, kvh=kvh, sp=300, d=128, sg=16
        )
        b = 2
        rng = np.random.RandomState(12)
        qk = jnp.asarray(
            rng.randn(b * k, 1, h, 128), jnp.float32
        ).astype(jnp.bfloat16)
        kgk = jnp.repeat(kg, k, axis=1)
        vgk = jnp.repeat(vg, k, axis=1) * 1.5
        gvk = jnp.asarray(
            np.arange(kg.shape[3])[None, :]
            < np.array([3, 7, 1, 5, 2, 16, 0, 9])[:, None]
        )
        gen = {"k": kgk, "v": vgk}
        if quant == "int8":
            kq_, ks_ = _quantize_kv(kp)
            vq_, vs_ = _quantize_kv(vp)
            pc = {"k": kq_, "v": vq_, "k_scale": ks_, "v_scale": vs_}
            gkq, gks = _quantize_kv(kgk)
            gvq, gvs = _quantize_kv(vgk)
            gen = {"k": gkq, "v": gvq, "k_scale": gks, "v_scale": gvs}
        elif quant == "int4":
            packs = [
                (_quantize_kv4(kp[i]), _quantize_kv4(vp[i]))
                for i in range(kp.shape[0])
            ]
            pc = {
                "k4": jnp.stack([p[0][0] for p in packs]),
                "v4": jnp.stack([p[1][0] for p in packs]),
                "k_scale": jnp.stack([p[0][1] for p in packs]),
                "v_scale": jnp.stack([p[1][1] for p in packs]),
            }
        else:
            pc = {"k": kp, "v": vp}
        monkeypatch.setenv("HALVA_BEAM_DOT", "grid")
        grid = np.asarray(
            decode_attend_layer(
                qk, pc, seg, gen, gvk, jnp.int32(1), beam_k=k
            ),
            np.float32,
        )
        monkeypatch.setenv("HALVA_BEAM_DOT", "fold")
        monkeypatch.setenv("HALVA_SCOPED_VMEM_MB", "64")
        fold = np.asarray(
            decode_attend_layer(
                qk, pc, seg, gen, gvk, jnp.int32(1), beam_k=k
            ),
            np.float32,
        )
        np.testing.assert_allclose(
            fold, grid, atol=2e-3, err_msg=str((h, kvh, quant))
        )


def test_fold_verify_matches_oracle():
    """Speculative-verify mode (shared gen cache + fresh causal
    candidates) vs the XLA oracle models/llama.py:_verify_attend:
    bf16 and int8 prompt caches, int8 gen cache, GQA, per-item
    gen_len."""
    from halva_tpu.models.llama import _verify_attend
    from halva_tpu.ops.decode_attention import fold_attend_layer

    kq = 4
    for h, kvh, quant in ((8, 8, "bf16"), (8, 2, "int8")):
        _, kp, vp, kg, vg, seg, _ = _setup_gqa(
            seed=21, b=2, h=h, kvh=kvh, sp=300, d=128, sg=16
        )
        b, d, sg = 2, 128, kg.shape[3]
        rng = np.random.RandomState(22)
        q = jnp.asarray(rng.randn(b, kq, h, d), jnp.float32).astype(
            jnp.bfloat16
        )
        kc = jnp.asarray(
            rng.randn(b, kq, kvh, d), jnp.float32
        ).astype(jnp.bfloat16)
        vc = jnp.asarray(
            rng.randn(b, kq, kvh, d), jnp.float32
        ).astype(jnp.bfloat16)
        gen_len = jnp.asarray(np.array([3, 9]), jnp.int32)
        gv = jnp.asarray(
            np.arange(sg)[None, :] < np.array([3, 9])[:, None]
        )
        li = 1
        gen = {"k": kg, "v": vg}
        gkw, gvw = kg[li], vg[li]
        gksw = gvsw = None
        if quant == "int8":
            kq8, ks8 = _quantize_kv(kp)
            vq8, vs8 = _quantize_kv(vp)
            pc = {"k": kq8, "v": vq8, "k_scale": ks8, "v_scale": vs8}
            gk8, gks8 = _quantize_kv(kg)
            gv8, gvs8 = _quantize_kv(vg)
            gen = {"k": gk8, "v": gv8, "k_scale": gks8, "v_scale": gvs8}
            kpw, vpw = kq8[li], vq8[li]
            kpsw, vpsw = ks8[li], vs8[li]
            gkw, gvw = gk8[li], gv8[li]
            gksw, gvsw = gks8[li], gvs8[li]
        else:
            pc = {"k": kp, "v": vp}
            kpw, vpw = kp[li], vp[li]
            kpsw = vpsw = None
        got = fold_attend_layer(
            q, pc, seg, gen, gv, jnp.int32(li),
            fold_k=kq, shared_gen=True, candidates=(kc, vc),
        )
        want = jax.jit(
            lambda: _verify_attend(
                q, kpw, vpw, kc, vc, seg, gkw, gvw, gen_len,
                kp_scale=kpsw, vp_scale=vpsw,
                kg_scale=gksw, vg_scale=gvsw,
            )
        )()
        _assert_close(got, want, atol=8e-3)


def test_rows_parity_all_modes(monkeypatch):
    """rows > 1 (multi-row grid steps under a raised scoped-VMEM budget,
    HALVA_SCOPED_VMEM_MB/HALVA_DECODE_ROWS) must match the rows=1 kernel
    EXACTLY: identical block sizes and merge order per row, only the
    grid packing changes. Covers bf16 / int8 / int4-packed caches and a
    rows value that does not divide the batch (falls back toward 1)."""
    from halva_tpu.models.llama import _quantize_kv4

    q, kp, vp, kg, vg, seg, _ = _setup(b=4, h=8, d=128, sp=384, sg=16)
    # _setup's gv helper covers b <= 3 rows; build a full (b, sg) mask
    gv = jnp.asarray(
        np.arange(kg.shape[3])[None, :]
        <= np.array([3, 7, 0, 5])[:, None]
    )
    gen = {"k": kg, "v": vg}
    packs8 = [
        (_quantize_kv(kp[i]), _quantize_kv(vp[i]))
        for i in range(kp.shape[0])
    ]
    pc8 = {
        "k": jnp.stack([p[0][0] for p in packs8]),
        "v": jnp.stack([p[1][0] for p in packs8]),
        "k_scale": jnp.stack([p[0][1] for p in packs8]),
        "v_scale": jnp.stack([p[1][1] for p in packs8]),
    }
    packs4 = [
        (_quantize_kv4(kp[i]), _quantize_kv4(vp[i]))
        for i in range(kp.shape[0])
    ]
    pc4 = {
        "k4": jnp.stack([p[0][0] for p in packs4]),
        "v4": jnp.stack([p[1][0] for p in packs4]),
        "k_scale": jnp.stack([p[0][1] for p in packs4]),
        "v_scale": jnp.stack([p[1][1] for p in packs4]),
    }
    for pc in (pc8, pc4, {"k": kp, "v": vp}):
        monkeypatch.delenv("HALVA_SCOPED_VMEM_MB", raising=False)
        monkeypatch.delenv("HALVA_DECODE_ROWS", raising=False)
        base = np.asarray(
            decode_attend_layer(q, pc, seg, gen, gv, jnp.int32(1)),
            np.float32,
        )
        for rows in ("2", "4", "3"):  # 3 does not divide 4 -> rows=1
            monkeypatch.setenv("HALVA_SCOPED_VMEM_MB", "64")
            monkeypatch.setenv("HALVA_DECODE_ROWS", rows)
            got = np.asarray(
                decode_attend_layer(q, pc, seg, gen, gv, jnp.int32(1)),
                np.float32,
            )
            np.testing.assert_array_equal(got, base)


def test_fused_budget_gate(monkeypatch):
    """The scoped-VMEM feasibility gate: the eval CLI's 1024-token
    default at 7B shapes (16MB of resident gen blocks) must NOT route
    to the fused kernel under the default 16MB budget — that pallas
    compile dies on real TPU — but becomes feasible when
    HALVA_SCOPED_VMEM_MB raises the compile budget."""
    from halva_tpu.ops.decode_attention import fused_budget_ok

    monkeypatch.delenv("HALVA_SCOPED_VMEM_MB", raising=False)
    assert fused_budget_ok(32, 128, 128, 1, 1, False)  # bench config
    assert not fused_budget_ok(32, 1024, 128, 1, 1, False)  # CLI 1024
    monkeypatch.setenv("HALVA_SCOPED_VMEM_MB", "64")
    assert fused_budget_ok(32, 1024, 128, 1, 1, False)
