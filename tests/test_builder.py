"""Eval model loader: HF llava checkpoint dirs, PEFT adapters, merging."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halva_tpu.config import LlamaConfig, LlavaConfig, ViTConfig
from halva_tpu.models import builder, llama, llava

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = LlavaConfig(
    llm=LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=160,
        num_layers=2, num_heads=4, max_position_embeddings=128,
    ),
    vision=ViTConfig(
        image_size=28, patch_size=14, hidden_size=32,
        intermediate_size=64, num_layers=2, num_heads=2,
    ),
)


def _hf_llava_dir(tmp_path, with_tower=True):
    """Fabricate an HF-format llava checkpoint dir from tiny HF modules."""
    torch.manual_seed(0)
    lm = transformers.LlamaForCausalLM(
        transformers.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=160,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=128, tie_word_embeddings=False,
            rms_norm_eps=1e-5, attn_implementation="eager",
        )
    ).eval()
    vt = transformers.CLIPVisionModel(
        transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
            hidden_act="quick_gelu",
        )
    ).eval()
    proj0 = torch.nn.Linear(32, 64)
    proj2 = torch.nn.Linear(64, 64)

    sd = {}
    sd.update({k: v for k, v in lm.state_dict().items()})
    sd.update(
        {
            "model.vision_tower.vision_tower." + k: v
            for k, v in vt.state_dict().items()
        }
    )
    sd["model.mm_projector.0.weight"] = proj0.weight.data
    sd["model.mm_projector.0.bias"] = proj0.bias.data
    sd["model.mm_projector.2.weight"] = proj2.weight.data
    sd["model.mm_projector.2.bias"] = proj2.bias.data
    if not with_tower:
        sd = {k: v for k, v in sd.items() if "vision_tower" not in k}

    d = tmp_path / "ckpt"
    d.mkdir()
    torch.save(sd, d / "pytorch_model.bin")
    (d / "config.json").write_text(
        json.dumps({"hidden_size": 64, "model_type": "llava"})
    )
    return str(d), lm, vt, (proj0, proj2)


def test_load_full_checkpoint(tmp_path, monkeypatch):
    d, lm, vt, _ = _hf_llava_dir(tmp_path)
    monkeypatch.setattr(
        builder, "config_from_hf", lambda _: TINY
    )
    params, cfg = builder.load_pretrained_model(d, dtype=jnp.float32)
    assert cfg is TINY
    # llm logits parity with the torch module we packed
    ids = np.random.RandomState(0).randint(0, 128, (1, 9))
    with torch.no_grad():
        want = lm(torch.tensor(ids)).logits.numpy()
    got = llama.forward(
        params["llm"], TINY.llm, jnp.asarray(ids), attn_impl="xla"
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)


def test_peft_adapter_merge(tmp_path, monkeypatch):
    d, lm, vt, _ = _hf_llava_dir(tmp_path)
    monkeypatch.setattr(builder, "config_from_hf", lambda _: TINY)

    # fabricate a PEFT adapter: q_proj/down_proj, r=2, alpha=4
    rng = np.random.RandomState(1)
    r = 2
    adapter = {}
    for layer in range(2):
        for proj, din, dout in (
            ("self_attn.q_proj", 64, 64),
            ("mlp.down_proj", 160, 64),
        ):
            a = rng.randn(r, din).astype(np.float32) * 0.1
            b = rng.randn(dout, r).astype(np.float32) * 0.1
            adapter[
                f"base_model.model.model.layers.{layer}.{proj}.lora_A.weight"
            ] = torch.tensor(a)
            adapter[
                f"base_model.model.model.layers.{layer}.{proj}.lora_B.weight"
            ] = torch.tensor(b)
    lora_dir = tmp_path / "adapter"
    lora_dir.mkdir()
    torch.save(adapter, lora_dir / "adapter_model.bin")
    (lora_dir / "adapter_config.json").write_text(
        json.dumps({"r": r, "lora_alpha": 4})
    )

    params, cfg = builder.load_pretrained_model(
        str(lora_dir), model_base=d, dtype=jnp.float32
    )
    # merged kernel = base + scale * A^T B^T
    base_params, _ = builder.load_pretrained_model(d, dtype=jnp.float32)
    scale = 4 / r
    for layer in range(2):
        a = adapter[
            f"base_model.model.model.layers.{layer}.self_attn.q_proj.lora_A.weight"
        ].numpy()
        b = adapter[
            f"base_model.model.model.layers.{layer}.self_attn.q_proj.lora_B.weight"
        ].numpy()
        want = (
            np.asarray(
                base_params["llm"]["layers"]["attn"]["wq"]["kernel"][layer]
            )
            + scale * a.T @ b.T
        )
        got = np.asarray(
            params["llm"]["layers"]["attn"]["wq"]["kernel"][layer]
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
    # no lora leaves remain after merge
    from halva_tpu.train.lora import _iter_dense

    for _, p in _iter_dense(params):
        assert "lora_a" not in p


def test_quant_tree_disk_cache(tmp_path, monkeypatch):
    """Quantized serving loads are cached on disk: the second load must
    skip the whole host pipeline (checkpoint read + quantize) and return
    an identical tree; touching the checkpoint invalidates the entry."""
    d, lm, vt, _ = _hf_llava_dir(tmp_path)
    monkeypatch.setattr(builder, "config_from_hf", lambda _: TINY)
    monkeypatch.setenv("HALVA_QUANT_CACHE", str(tmp_path / "qcache"))

    cold, _ = builder.load_pretrained_model(d, dtype=jnp.bfloat16, quant="int8")
    cache_files = list((tmp_path / "qcache").glob("qtree_*.npz"))
    assert len(cache_files) == 1

    # a warm load must not re-run the host pipeline
    def boom(*a, **k):
        raise AssertionError("cache miss: host pipeline re-ran")

    monkeypatch.setattr(builder, "load_hf_state_dict", boom)
    warm, cfg = builder.load_pretrained_model(
        d, dtype=jnp.bfloat16, quant="int8"
    )
    assert cfg.llm.hidden_size == TINY.llm.hidden_size
    for a, b in zip(jax.tree.leaves(cold), jax.tree.leaves(warm)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # different quant config -> different key -> pipeline runs again
    with pytest.raises(AssertionError, match="host pipeline"):
        builder.load_pretrained_model(d, dtype=jnp.bfloat16, quant="int4")

    # touching a checkpoint file invalidates the int8 entry too
    p = os.path.join(d, "pytorch_model.bin")
    os.utime(p, ns=(os.stat(p).st_atime_ns, os.stat(p).st_mtime_ns + 7))
    with pytest.raises(AssertionError, match="host pipeline"):
        builder.load_pretrained_model(d, dtype=jnp.bfloat16, quant="int8")


def test_missing_tower_raises(tmp_path, monkeypatch):
    d, *_ = _hf_llava_dir(tmp_path, with_tower=False)
    monkeypatch.setattr(builder, "config_from_hf", lambda _: TINY)
    with pytest.raises(FileNotFoundError):
        builder.load_pretrained_model(d)
