"""Alt LLM backend capabilities: Mistral sliding window (HF parity),
MPT-style ALiBi, ViT pos-embed interpolation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halva_tpu.config import LlamaConfig, ViTConfig
from halva_tpu.models import llama, vit
from halva_tpu.models.convert_hf import clip_vit_from_hf, llama_from_hf
from halva_tpu.ops.attention import alibi_bias

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_mistral_sliding_window_parity():
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=160,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        sliding_window=4,
    )
    hf_cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=160,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        sliding_window=4, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.MistralForCausalLM(hf_cfg).eval()
    params = llama_from_hf(model.state_dict(), cfg)

    ids = np.random.RandomState(0).randint(0, 128, (1, 12))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        llama.forward(params, cfg, jnp.asarray(ids), attn_impl="xla")
    )
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)


def test_sliding_window_actually_limits():
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=1, num_heads=2, max_position_embeddings=64,
        sliding_window=2,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    ids = rng.randint(0, 64, (1, 10))
    base = np.asarray(llama.forward(params, cfg, jnp.asarray(ids)))
    # tokens beyond the window must not influence position 9
    ids2 = ids.copy()
    ids2[0, 0] = (ids2[0, 0] + 7) % 64  # outside window of position 9
    pert = np.asarray(llama.forward(params, cfg, jnp.asarray(ids2)))
    np.testing.assert_allclose(base[0, 9], pert[0, 9], atol=1e-6)
    # but within-window change does
    ids3 = ids.copy()
    ids3[0, 8] = (ids3[0, 8] + 7) % 64
    pert3 = np.asarray(llama.forward(params, cfg, jnp.asarray(ids3)))
    assert np.abs(base[0, 9] - pert3[0, 9]).max() > 1e-5


def test_alibi_slopes_and_bias():
    pos = jnp.arange(5, dtype=jnp.int32)[None]
    bias = np.asarray(alibi_bias(8, pos, pos))
    assert bias.shape == (1, 8, 5, 5)
    # head 0 slope = 2^-1 = 0.5: bias at (q=2, k=0) = -1.0
    np.testing.assert_allclose(bias[0, 0, 2, 0], -1.0, atol=1e-6)
    np.testing.assert_allclose(bias[0, 0, 2, 2], 0.0, atol=1e-6)
    # slopes halve per head on a power-of-two ladder
    np.testing.assert_allclose(
        bias[0, 1, 2, 0] / bias[0, 0, 2, 0], 0.5, atol=1e-6
    )


def test_alibi_model_runs_and_bias_is_active(monkeypatch):
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=1, num_heads=4, max_position_embeddings=64,
        position_embedding="alibi",
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    ids = np.random.RandomState(0).randint(0, 64, (1, 8))
    out = np.asarray(llama.forward(params, cfg, jnp.asarray(ids)))
    assert np.isfinite(out).all()

    # zeroing the bias must change the output (bias path is live).
    # attention() is module-level jitted, so clear its trace cache or the
    # patched alibi_bias is never retraced.
    import halva_tpu.ops.attention as attn_mod

    real = attn_mod.alibi_bias
    monkeypatch.setattr(
        attn_mod,
        "alibi_bias",
        lambda h, q, k: jnp.zeros_like(real(h, q, k)),
    )
    attn_mod.attention.clear_cache()
    try:
        out0 = np.asarray(llama.forward(params, cfg, jnp.asarray(ids)))
    finally:
        monkeypatch.undo()
        attn_mod.attention.clear_cache()
    assert np.abs(out - out0).max() > 1e-6


def test_pos_embed_interpolation():
    cfg = ViTConfig(
        image_size=28, patch_size=14, hidden_size=32,
        intermediate_size=64, num_layers=2, num_heads=2,
    )
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    new_params, new_cfg = vit.interpolate_pos_embed(params, cfg, 56)
    assert new_cfg.image_size == 56
    assert new_params["pos_embed"]["embedding"].shape[0] == 1 + 16
    imgs = np.random.RandomState(0).randn(1, 3, 56, 56).astype(np.float32)
    out = vit.encode(new_params, new_cfg, jnp.asarray(imgs))
    assert out.shape == (1, 16, 32)


def test_mpt_parity():
    """Full MPT block structure (LayerNorm, non-gated ffn, ALiBi, packed
    Wqkv) vs HF MptForCausalLM."""
    from halva_tpu.models.convert_hf import mpt_from_hf

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=256,  # expansion 4x
        num_layers=2,
        num_heads=4,  # power of two: slope conventions align
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        tie_word_embeddings=True,
        position_embedding="alibi",
        mlp_act="gelu",
        norm_type="layernorm",
        gated_mlp=False,
    )
    hf_cfg = transformers.MptConfig(
        vocab_size=128, d_model=64, n_heads=4, n_layers=2,
        expansion_ratio=4, max_seq_len=128, layer_norm_epsilon=1e-5,
        no_bias=True, attn_config=transformers.models.mpt
        .configuration_mpt.MptAttentionConfig(alibi=True),
    )
    torch.manual_seed(0)
    model = transformers.MptForCausalLM(hf_cfg).eval()
    params = mpt_from_hf(model.state_dict(), cfg)

    ids = np.random.RandomState(0).randint(0, 128, (1, 10))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        llama.forward(params, cfg, jnp.asarray(ids), attn_impl="xla")
    )
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)


def _decode_vs_full(cfg, params, total_len=12, prompt_len=7, b=2):
    """prefill + decode_step trajectory must equal the full forward —
    the serving-path twin of the training forward for this config."""
    rng = np.random.RandomState(3)
    ids = rng.randint(0, cfg.vocab_size, (b, total_len))
    full = np.asarray(
        llama.forward(params, cfg, jnp.asarray(ids), attn_impl="xla")
    )
    seg = jnp.ones((b, prompt_len), jnp.int32)
    pos = jnp.broadcast_to(
        jnp.arange(prompt_len, dtype=jnp.int32), (b, prompt_len)
    )
    embeds = llama.embed(params, jnp.asarray(ids[:, :prompt_len]))
    hidden, prompt_cache = llama.prefill(
        params, cfg, embeds, seg, pos,
        cache_dtype=jnp.float32, attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(llama.lm_logits(params, cfg, hidden)),
        full[:, :prompt_len], atol=2e-4, rtol=3e-3,
    )
    max_new = total_len - prompt_len
    gen_cache = llama.init_gen_cache(cfg, b, max_new, dtype=jnp.float32)
    for step in range(max_new):
        t = prompt_len + step
        tok = jnp.asarray(ids[:, t : t + 1])
        step_logits, gen_cache = llama.decode_step(
            params, cfg, llama.embed(params, tok),
            jnp.full((b,), t, jnp.int32), prompt_cache, seg,
            gen_cache, jnp.int32(step),
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), full[:, t], atol=2e-4, rtol=3e-3
        )


def test_alibi_decode_matches_full_forward():
    """MPT-class serving: prefill must NOT rotate (no RoPE) and decode
    must apply the per-step ALiBi bias to both cache halves (was
    silently wrong: RoPE applied + bias dropped)."""
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, max_position_embeddings=64,
        position_embedding="alibi",
    )
    params = llama.init_params(jax.random.PRNGKey(2), cfg)
    _decode_vs_full(cfg, params)


def test_sliding_window_decode_matches_full_forward():
    """Mistral-class serving with a window SMALLER than the sequence:
    decode must mask prompt and generated keys older than the window
    exactly like the full forward."""
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2,
        max_position_embeddings=64, sliding_window=4,
    )
    params = llama.init_params(jax.random.PRNGKey(5), cfg)
    _decode_vs_full(cfg, params)
