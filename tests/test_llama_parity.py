"""fp32 logit parity of our functional Llama vs HF LlamaForCausalLM.

A tiny random HF model is built from config (no network) and its weights
converted through models/convert_hf.py; logits must match to float32
tolerance. This is SURVEY.md §7 hard part #1 for the LLM half.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from halva_tpu.config import LlamaConfig
from halva_tpu.models import llama
from halva_tpu.models.convert_hf import llama_from_hf

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=160,
    num_layers=3,
    num_heads=4,
    max_position_embeddings=128,
    rms_norm_eps=1e-5,
)


def _hf_model(cfg: LlamaConfig, num_kv_heads=None):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=num_kv_heads or cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    return model


def test_logit_parity_full_sequence():
    model = _hf_model(CFG)
    sd = model.state_dict()
    params = llama_from_hf(sd, CFG)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, CFG.vocab_size, (2, 17))

    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    got = llama.forward(params, CFG, jnp.asarray(ids), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_logit_parity_gqa():
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=160,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        max_position_embeddings=128,
    )
    model = _hf_model(cfg, num_kv_heads=2)
    params = llama_from_hf(model.state_dict(), cfg)
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, (1, 9))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got = llama.forward(params, cfg, jnp.asarray(ids), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_padding_invariance():
    """Right padding (segment id 0) must not change valid-token logits."""
    model = _hf_model(CFG)
    params = llama_from_hf(model.state_dict(), CFG)
    rng = np.random.RandomState(2)
    ids = rng.randint(0, CFG.vocab_size, (1, 10))

    full = llama.forward(params, CFG, jnp.asarray(ids), attn_impl="xla")

    padded = np.concatenate([ids, np.zeros((1, 6), np.int64)], axis=1)
    seg = np.concatenate(
        [np.ones((1, 10), np.int32), np.zeros((1, 6), np.int32)], axis=1
    )
    got = llama.forward(
        params,
        CFG,
        jnp.asarray(padded),
        segment_ids=jnp.asarray(seg),
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(got[:, :10]), np.asarray(full), atol=1e-4, rtol=1e-3
    )


def test_prefill_decode_matches_full_forward():
    """Split-cache prefill + N decode steps == one full forward."""
    model = _hf_model(CFG)
    params = llama_from_hf(model.state_dict(), CFG)
    rng = np.random.RandomState(3)
    b, prompt_len, total_len = 2, 7, 12
    max_new = total_len - prompt_len
    ids = rng.randint(0, CFG.vocab_size, (b, total_len))

    full = np.asarray(
        llama.forward(params, CFG, jnp.asarray(ids), attn_impl="xla")
    )

    seg = jnp.ones((b, prompt_len), jnp.int32)
    pos = jnp.broadcast_to(
        jnp.arange(prompt_len, dtype=jnp.int32), (b, prompt_len)
    )
    embeds = llama.embed(params, jnp.asarray(ids[:, :prompt_len]))
    hidden, prompt_cache = llama.prefill(
        params, CFG, embeds, seg, pos,
        cache_dtype=jnp.float32, attn_impl="xla",
    )
    logits_prefill = llama.lm_logits(params, CFG, hidden)
    np.testing.assert_allclose(
        np.asarray(logits_prefill), full[:, :prompt_len], atol=1e-4, rtol=1e-3
    )

    gen_cache = llama.init_gen_cache(CFG, b, max_new, dtype=jnp.float32)
    for step in range(max_new):
        t = prompt_len + step
        tok = jnp.asarray(ids[:, t : t + 1])
        step_logits, gen_cache = llama.decode_step(
            params,
            CFG,
            llama.embed(params, tok),
            jnp.full((b,), t, jnp.int32),
            prompt_cache,
            seg,
            gen_cache,
            jnp.int32(step),
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), full[:, t], atol=1e-4, rtol=1e-3
        )
