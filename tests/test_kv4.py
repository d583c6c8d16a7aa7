"""int4 prompt-KV cache: packing, fused-kernel parity, e2e decode.

The serving motivation: llava-7b b56 decode is KV-bandwidth-bound
(int8 prompt KV is ~9 GB of the ~13 GB/step HBM traffic — docs/PERF.md);
nibble-packing token pairs halves it again. Layout contracts live in
llama._quantize_kv4 / ops/decode_attention (even/odd sub-blocks keep
every in-kernel access lane-aligned on real TPU).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from halva_tpu.config import LLAVA_TINY
from halva_tpu.constants import IMAGE_TOKEN_INDEX
from halva_tpu.models import llama, llava
from halva_tpu.ops.decode_attention import decode_attend_layer, seg_even_odd
from halva_tpu.ops.generate import generate_greedy


def test_quantize_kv4_roundtrip():
    rng = np.random.RandomState(0)
    B, H, S, D = 2, 4, 10, 128
    t = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    packed, scales = llama._quantize_kv4(t)
    assert packed.shape == (B, H, S // 2, D) and packed.dtype == jnp.int8
    assert scales.shape == (B, 2, H, S // 2)
    lo, hi = llama._unpack_kv4(packed)
    sk = np.asarray(scales, np.float32)
    deq = np.zeros((B, H, S, D), np.float32)
    deq[:, :, 0::2] = np.asarray(lo, np.float32) * np.moveaxis(
        sk[:, 0], -1, -1
    )[..., None]
    deq[:, :, 1::2] = np.asarray(hi, np.float32) * sk[:, 1][..., None]
    # symmetric absmax/7: per-row error <= scale/2 = absmax/14, plus
    # ~0.4% from the bf16 scale storage
    row_absmax = np.max(np.abs(np.asarray(t)), axis=-1, keepdims=True)
    assert np.all(np.abs(deq - np.asarray(t)) <= row_absmax / 13.5)


def test_seg_even_odd_pads_odd_tail():
    seg = jnp.asarray([[1, 1, 2, 2, 3]])  # odd length
    eo = seg_even_odd(seg)
    assert eo.shape == (1, 2, 3)
    np.testing.assert_array_equal(np.asarray(eo[0, 0]), [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(eo[0, 1]), [1, 2, 0])


def _packed_cache(rng, L, B, H, S, D):
    ks, vs, kps, vps = [], [], [], []
    for _ in range(L):
        k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
        v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
        pk, sk = llama._quantize_kv4(k)
        pv, sv = llama._quantize_kv4(v)
        ks.append(pk), vs.append(pv), kps.append(sk), vps.append(sv)
    return {
        "k4": jnp.stack(ks),
        "v4": jnp.stack(vs),
        "k_scale": jnp.stack(kps),
        "v_scale": jnp.stack(vps),
    }


@pytest.mark.parametrize("layer", [0, 1])
def test_fused_kernel_matches_oracle_on_packed_cache(layer):
    """decode_attend_layer consuming the packed layout natively must
    match _decode_attend over the unpacked even/odd view (interpret
    mode on CPU; the same kernel code path runs on real TPU)."""
    rng = np.random.RandomState(1)
    L, B, H, S, D, Sg = 2, 2, 4, 10, 128, 128
    cache = _packed_cache(rng, L, B, H, S, D)
    q = jnp.asarray(rng.randn(B, 1, H, D), jnp.bfloat16)
    seg = np.ones((B, S), np.int32)
    seg[1, 7:] = 0  # padded tail row
    seg = jnp.asarray(seg)
    gen = {
        "k": jnp.asarray(
            rng.randn(L, B, H, Sg, D), jnp.bfloat16
        ),
        "v": jnp.asarray(rng.randn(L, B, H, Sg, D), jnp.bfloat16),
    }
    gv = jnp.zeros((B, Sg), bool).at[:, :2].set(True)

    fused = decode_attend_layer(q, cache, seg, gen, gv, jnp.int32(layer))

    klo, khi = llama._unpack_kv4(cache["k4"][layer])
    vlo, vhi = llama._unpack_kv4(cache["v4"][layer])
    kp = jnp.concatenate([klo, khi], axis=2).astype(jnp.int8)
    vp = jnp.concatenate([vlo, vhi], axis=2).astype(jnp.int8)
    kps = jnp.concatenate(
        [cache["k_scale"][layer][:, 0], cache["k_scale"][layer][:, 1]],
        axis=2,
    )
    vps = jnp.concatenate(
        [cache["v_scale"][layer][:, 0], cache["v_scale"][layer][:, 1]],
        axis=2,
    )
    ref = llama._decode_attend(
        q, kp, vp, gen["k"][layer], gen["v"][layer],
        seg_even_odd(seg).reshape(B, -1), gv,
        kp_scale=kps, vp_scale=vps,
    )
    err = float(
        jnp.max(jnp.abs(fused.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    assert err < 0.02, err


@pytest.mark.parametrize("prompt_len", [9, 10])  # odd + even spliced
def test_generate_int4_kv_end_to_end(prompt_len):
    """kv_quant='int4' decodes through prefill-pack + XLA-oracle unpack
    (CPU path) for both spliced-length parities; int4 attention noise
    may flip greedy ties on a random tiny model, so the contract here is
    executability + valid tokens (quality is bounded at 7B shapes by
    scripts/quant_quality.py --mode kv4)."""
    cfg = LLAVA_TINY
    params = llava.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.RandomState(0)
    B = 2
    ids = rng.randint(5, 250, (B, prompt_len)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    lens = np.full((B,), prompt_len, np.int32)
    imgs = rng.randn(B, 3, 28, 28).astype(np.float32)
    toks, num = generate_greedy(
        params, cfg, jnp.asarray(ids), jnp.asarray(imgs),
        jnp.asarray(lens), max_new_tokens=8, eos_id=-1,
        kv_quant="int4",
    )
    toks = np.asarray(toks)
    assert toks.shape == (B, 8)
    assert np.all(toks >= 0) and np.all(toks < cfg.llm.vocab_size)
    assert np.all(np.asarray(num) == 8)


def test_fused_kernel_gqa_packed_cache():
    """int4 packed cache + GQA (kvh < h): the grouped kernel path over
    even/odd sub-blocks matches the XLA oracle on the unpacked view."""
    rng = np.random.RandomState(6)
    L, B, H, KVH, S, D, Sg = 2, 2, 8, 2, 10, 128, 128
    cache = _packed_cache(rng, L, B, KVH, S, D)
    q = jnp.asarray(rng.randn(B, 1, H, D), jnp.bfloat16)
    seg = np.ones((B, S), np.int32)
    seg[1, 7:] = 0
    seg = jnp.asarray(seg)
    gen = {
        "k": jnp.asarray(rng.randn(L, B, KVH, Sg, D), jnp.bfloat16),
        "v": jnp.asarray(rng.randn(L, B, KVH, Sg, D), jnp.bfloat16),
    }
    gv = jnp.zeros((B, Sg), bool).at[:, :3].set(True)
    for layer in (0, 1):
        fused = decode_attend_layer(
            q, cache, seg, gen, gv, jnp.int32(layer)
        )
        klo, khi = llama._unpack_kv4(cache["k4"][layer])
        vlo, vhi = llama._unpack_kv4(cache["v4"][layer])
        kp = jnp.concatenate([klo, khi], axis=2).astype(jnp.int8)
        vp = jnp.concatenate([vlo, vhi], axis=2).astype(jnp.int8)
        kps = jnp.concatenate(
            [cache["k_scale"][layer][:, 0], cache["k_scale"][layer][:, 1]],
            axis=2,
        )
        vps = jnp.concatenate(
            [cache["v_scale"][layer][:, 0], cache["v_scale"][layer][:, 1]],
            axis=2,
        )
        seg_eo = seg_even_odd(seg).reshape(B, -1)
        ref = llama._decode_attend(
            q, kp, vp, gen["k"][layer], gen["v"][layer], seg_eo, gv,
            kp_scale=kps, vp_scale=vps,
        )
        np.testing.assert_allclose(
            np.asarray(fused, np.float32),
            np.asarray(ref, np.float32),
            atol=8e-3,
        )
