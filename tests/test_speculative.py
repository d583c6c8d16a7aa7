"""Prompt-lookup speculative decode: greedy-exactness + draft soundness.

The invariant under test (ops/speculative.py): emitted tokens are
bit-identical to ops.generate.generate_greedy REGARDLESS of draft
quality, across cache quantization modes, because acceptance only keeps
tokens equal to the model's own argmax.
"""

import numpy as np

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAVA_TINY
from halva_tpu.constants import IMAGE_TOKEN_INDEX
from halva_tpu.models import llava
from halva_tpu.ops.generate import generate_greedy
from halva_tpu.ops.speculative import generate_speculative, ngram_draft

CFG = LLAVA_TINY


def _inputs(b=2, s=9, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(5, 50, (b, s)).astype(np.int32)
    ids[0, 1] = IMAGE_TOKEN_INDEX
    ids[1, 0] = IMAGE_TOKEN_INDEX
    lens = np.array([s, s - 3], np.int32)
    ids[1, s - 3:] = 0
    images = rng.randn(
        b, 3, CFG.vision.image_size, CFG.vision.image_size
    ).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(images), jnp.asarray(lens)


def _trim(tokens, num, eos):
    return [
        [t for t in row.tolist() if t != eos][: int(n)]
        for row, n in zip(np.asarray(tokens), np.asarray(num))
    ]


def _check_parity(eos, kv_quant, draft_k, max_new=12, seed=0):
    params = llava.init_params(jax.random.PRNGKey(0), CFG)
    ids, images, lens = _inputs(seed=seed)
    ref_t, ref_n = generate_greedy(
        params, CFG, ids, images, lens, max_new_tokens=max_new,
        eos_id=eos, attn_impl="xla", kv_quant=kv_quant,
    )
    got_t, got_n, stats = generate_speculative(
        params, CFG, ids, images, lens, max_new_tokens=max_new,
        eos_id=eos, draft_k=draft_k, attn_impl="xla", kv_quant=kv_quant,
    )
    ref = _trim(ref_t, ref_n, eos)
    got = _trim(got_t, got_n, eos)
    assert got == ref, (kv_quant, draft_k, got, ref)
    assert np.array_equal(np.asarray(ref_n), np.asarray(got_n))
    return stats


def test_spec_matches_greedy_bf16():
    # eos=2 is never produced by this model/seed within the budget
    # (pinned by the generate tests); the full budget exercises the
    # verify loop's steady state
    stats = _check_parity(eos=2, kv_quant=False, draft_k=4)
    assert stats["verify_steps"] >= 1
    assert stats["emitted_tokens"] >= stats["verify_steps"]


def test_spec_matches_greedy_int8_kv():
    _check_parity(eos=2, kv_quant=True, draft_k=3)


def test_spec_matches_greedy_int4_kv():
    _check_parity(eos=2, kv_quant="int4", draft_k=4)


def test_spec_eos_exit_parity():
    """Pick an eos the model actually emits mid-stream (from a probe
    greedy run) so the early-exit path — including an eos landing inside
    an accepted draft window — is exercised, then re-check parity."""
    params = llava.init_params(jax.random.PRNGKey(0), CFG)
    ids, images, lens = _inputs()
    probe_t, probe_n = generate_greedy(
        params, CFG, ids, images, lens, max_new_tokens=12,
        eos_id=-1, attn_impl="xla",
    )
    probe = np.asarray(probe_t)
    eos = int(probe[0, 3])  # forces row 0 to exit at step 3
    _check_parity(eos=eos, kv_quant=False, draft_k=4)


def test_spec_acceptance_wins_on_repetitive_output():
    """Tiny random models converge to cyclic argmax output; prompt
    lookup must then accept drafts (emitted > steps), proving the
    speculation path does more than fall back to 1 token/step."""
    params = llava.init_params(jax.random.PRNGKey(0), CFG)
    ids, images, lens = _inputs()
    _, num, stats = generate_speculative(
        params, CFG, ids, images, lens, max_new_tokens=24,
        eos_id=2, draft_k=4, attn_impl="xla",
    )
    if stats["emitted_tokens"] <= stats["verify_steps"]:
        import pytest

        pytest.skip(
            "model output not repetitive at this seed — acceptance "
            "cannot be forced, parity tests still cover correctness"
        )
    assert stats["emitted_tokens"] > stats["verify_steps"]


def test_verify_step_w4_matches_xla():
    """Fused w4 verify (llama._verify_step_w4: folded Pallas attention +
    stacked-int4 matmul streaming) vs the XLA verify scan on the same
    int4 tree, at fused-eligible shapes (head 128, Sg 128): logits
    argmax-identical and close, candidate KV writes identical."""
    from halva_tpu.config import LlamaConfig
    from halva_tpu.models import llama
    from halva_tpu.ops.w4_matmul import quantize_params_int4_host

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=320,
        num_layers=2, num_heads=2, max_position_embeddings=512,
    )
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    p4 = jax.tree.map(
        jnp.asarray,
        quantize_params_int4_host(jax.tree.map(np.asarray, params)),
    )
    b, s, kq, sg = 2, 40, 4, 128
    rng = np.random.RandomState(7)
    seg = np.ones((b, s), np.int32)
    seg[1, 30:] = 0
    seg = jnp.asarray(seg)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    # f32 activations: XLA:CPU's DotThunk rejects bf16 x bf16 -> f32
    # batched dots; numerics paths are dtype-generic
    embeds = jnp.asarray(rng.randn(b, s, 256), jnp.float32)
    for cache_mode in ("int8", "int4"):
        _, pc = jax.jit(
            lambda e: llama.prefill(
                p4, cfg, e, seg, pos, attn_impl="xla",
                quantize_cache=cache_mode,
            )
        )(embeds)
        gen = llama.init_gen_cache(cfg, b, sg, quantized=True)
        te = jnp.asarray(rng.randn(b, kq, 256), jnp.float32)
        pos0 = jnp.asarray([40, 30], jnp.int32)
        gen_len = jnp.asarray([0, 0], jnp.int32)
        lx, gx = jax.jit(
            lambda: llama.verify_step(
                p4, cfg, te, pos0, pc, seg, gen, gen_len,
                allow_fused=False,
            )
        )()
        lf, gf = jax.jit(
            lambda: llama._verify_step_w4(
                p4, cfg, te, pos0, pc, seg, gen, gen_len
            )
        )()
        np.testing.assert_array_equal(
            np.argmax(np.asarray(lx), -1), np.argmax(np.asarray(lf), -1),
            err_msg=cache_mode,
        )
        np.testing.assert_allclose(
            np.asarray(lx), np.asarray(lf), atol=0.08, err_msg=cache_mode
        )
        for kk in gx:
            np.testing.assert_array_equal(
                np.asarray(gx[kk]), np.asarray(gf[kk]), err_msg=kk
            )
        # a second step with nonzero, per-row gen_len (filled cache)
        gen_len2 = jnp.asarray([3, 1], jnp.int32)
        pos2 = pos0 + gen_len2
        lx2, _ = jax.jit(
            lambda: llama.verify_step(
                p4, cfg, te, pos2, pc, seg, gx, gen_len2,
                allow_fused=False,
            )
        )()
        lf2, _ = jax.jit(
            lambda: llama._verify_step_w4(
                p4, cfg, te, pos2, pc, seg, gf, gen_len2
            )
        )()
        np.testing.assert_array_equal(
            np.argmax(np.asarray(lx2), -1),
            np.argmax(np.asarray(lf2), -1),
            err_msg=cache_mode,
        )
        np.testing.assert_allclose(
            np.asarray(lx2), np.asarray(lf2), atol=0.08,
            err_msg=cache_mode,
        )


def test_ngram_draft_finds_latest_continuation():
    hist = jnp.asarray(
        [[7, 8, 9, 3, 7, 8, 4, 5, 0, 7, 8]], dtype=jnp.int32
    )
    valid = jnp.ones((1, 11), bool).at[0, 8].set(False)
    # context ends ... 7, 8 (at positions 9, 10); earlier (7, 8) pairs
    # at 0 (-> 9) and 4 (-> 4, 5): the LATEST valid one (4) must win
    draft = ngram_draft(
        hist, valid,
        prev=jnp.asarray([7]), cur=jnp.asarray([8]),
        self_pos=jnp.asarray([9]), n_draft=2,
    )
    assert draft.tolist() == [[4, 5]]


def test_ngram_draft_fallback_repeats_cur():
    hist = jnp.asarray([[1, 2, 3, 4, 5]], dtype=jnp.int32)
    valid = jnp.ones((1, 5), bool)
    draft = ngram_draft(
        hist, valid,
        prev=jnp.asarray([9]), cur=jnp.asarray([9]),
        self_pos=jnp.asarray([-1]), n_draft=3,
    )
    assert draft.tolist() == [[9, 9, 9]]
