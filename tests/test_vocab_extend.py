"""Vocab extension + mean-init embedding resize parity vs the reference
math (llava/model/llava_arch.py:398-440 initialize_vision_tokenizer,
llava/train/train_halva.py:211-233 smart_tokenizer_and_embedding_resize):
new rows of the input embeddings and new columns of the output head both
get the MEAN of the pre-existing entries."""

import numpy as np

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAVA_TINY
from halva_tpu.models import llama, llava
from halva_tpu.models.vocab import extend_tokenizer_and_embeddings


class FakeTokenizer:
    """add_tokens/add_special_tokens/__len__ surface of an HF tokenizer."""

    def __init__(self, vocab_size):
        self._n = vocab_size
        self._added = {}

    def add_tokens(self, toks, special_tokens=True):
        new = [t for t in toks if t not in self._added]
        for t in new:
            self._added[t] = self._n + len(self._added)
        return len(new)

    def add_special_tokens(self, d):
        return self.add_tokens(list(d.values()))

    def __len__(self):
        return self._n + len(self._added)


def _torch_reference_resize(emb, head, num_new):
    """The reference's exact torch ops on the same arrays."""
    import torch

    inp = torch.cat(
        [torch.tensor(np.asarray(emb, np.float32)),
         torch.zeros(num_new, emb.shape[1])]
    )
    out = torch.cat(
        [torch.tensor(np.asarray(head, np.float32)),
         torch.zeros(num_new, head.shape[1])]
    )
    inp[-num_new:] = inp[:-num_new].mean(dim=0, keepdim=True)
    out[-num_new:] = out[:-num_new].mean(dim=0, keepdim=True)
    return inp.numpy(), out.numpy()


def test_mean_init_matches_torch_reference():
    cfg = LLAVA_TINY
    params = llava.init_params(jax.random.PRNGKey(0), cfg)
    tok = FakeTokenizer(cfg.llm.vocab_size)

    new_params, new_cfg, n_new = extend_tokenizer_and_embeddings(
        params, cfg, tok, mm_use_im_start_end=True
    )
    assert n_new == 2
    assert new_cfg.llm.vocab_size == cfg.llm.vocab_size + 2
    assert len(tok) == new_cfg.llm.vocab_size

    emb = np.asarray(params["llm"]["embed"]["embedding"])
    head = np.asarray(params["llm"]["lm_head"]["kernel"]).T  # (V, D)
    want_emb, want_head = _torch_reference_resize(emb, head, 2)

    got_emb = np.asarray(new_params["llm"]["embed"]["embedding"])
    got_head = np.asarray(new_params["llm"]["lm_head"]["kernel"]).T
    # mean reduction order differs (np vs torch): allow float noise
    np.testing.assert_allclose(got_emb, want_emb, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(got_head, want_head, rtol=1e-5, atol=1e-8)
    # original rows untouched
    np.testing.assert_array_equal(got_emb[:-2], emb)


def test_idempotent_when_tokens_exist():
    cfg = LLAVA_TINY
    params = llava.init_params(jax.random.PRNGKey(1), cfg)
    tok = FakeTokenizer(cfg.llm.vocab_size)
    params, cfg, n1 = extend_tokenizer_and_embeddings(
        params, cfg, tok, mm_use_im_start_end=True
    )
    params2, cfg2, n2 = extend_tokenizer_and_embeddings(
        params, cfg, tok, mm_use_im_start_end=True
    )
    assert n1 == 2 and n2 == 0
    assert cfg2.llm.vocab_size == cfg.llm.vocab_size
    assert params2 is params


def test_extra_special_tokens_pad():
    """smart_tokenizer_and_embedding_resize with a pad token (the
    reference's v0 path, train_halva.py:1106-1111)."""
    cfg = LLAVA_TINY
    params = llava.init_params(jax.random.PRNGKey(2), cfg)
    tok = FakeTokenizer(cfg.llm.vocab_size)
    params, new_cfg, n = extend_tokenizer_and_embeddings(
        params, cfg, tok, extra_special_tokens={"pad_token": "[PAD]"}
    )
    assert n == 1
    assert new_cfg.llm.vocab_size == cfg.llm.vocab_size + 1


def test_forward_runs_with_extended_vocab():
    """New token ids embed and project: logits width tracks new vocab."""
    cfg = LLAVA_TINY
    params = llava.init_params(jax.random.PRNGKey(3), cfg)
    tok = FakeTokenizer(cfg.llm.vocab_size)
    params, cfg, _ = extend_tokenizer_and_embeddings(
        params, cfg, tok, mm_use_im_start_end=True
    )
    ids = jnp.asarray(
        [[5, cfg.llm.vocab_size - 2, cfg.llm.vocab_size - 1, 7]],
        jnp.int32,
    )
    logits = llama.forward(params["llm"], cfg.llm, ids, attn_impl="xla")
    assert logits.shape == (1, 4, cfg.llm.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # both new rows are the same mean-init vector, so swapping which new
    # token sits at a position changes nothing
    ids_b = ids.at[0, 1].set(cfg.llm.vocab_size - 1)
    logits_b = llama.forward(
        params["llm"], cfg.llm, ids_b, attn_impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_b), atol=1e-6
    )
