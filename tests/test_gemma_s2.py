"""Gemma-family decoder parity and S2 multiscale encoding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from halva_tpu.config import LlamaConfig, ViTConfig
from halva_tpu.models import llama, s2, vit
from halva_tpu.models.convert_hf import llama_from_hf

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_gemma_parity():
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=1,
        head_dim=16,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        tie_word_embeddings=True,
        mlp_act="gelu_tanh",
        rmsnorm_unit_offset=True,
        embed_scale=True,
    )
    hf_cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
        hidden_act="gelu_pytorch_tanh", attn_implementation="eager",
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    model = transformers.GemmaForCausalLM(hf_cfg).eval()
    params = llama_from_hf(model.state_dict(), cfg)

    ids = np.random.RandomState(0).randint(0, 128, (1, 11))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(
        llama.forward(params, cfg, jnp.asarray(ids), attn_impl="xla")
    )
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)


CFG = ViTConfig(
    image_size=28, patch_size=14, hidden_size=32,
    intermediate_size=64, num_layers=2, num_heads=2,
)


def test_s2_shapes_and_base_scale_consistency():
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    )
    out = s2.encode_multiscale(params, CFG, imgs, scales=(28, 56))
    assert out.shape == (2, 4, 64)  # base 2x2 tokens, channels doubled
    # the first channel block is exactly the base-scale encode
    base = vit.encode(params, CFG, imgs)
    np.testing.assert_allclose(
        np.asarray(out[..., :32]), np.asarray(base), atol=1e-5
    )


def test_s2_tile_split_stitch_roundtrip():
    # constant-color tiles survive split -> encode-free stitch check
    imgs = np.zeros((1, 3, 56, 56), np.float32)
    imgs[0, :, :28, :28] = 1.0  # top-left tile hot
    tiles = s2._split_tiles(jnp.asarray(imgs), 28)
    assert tiles.shape == (4, 3, 28, 28)
    assert float(tiles[0].mean()) == 1.0
    assert float(tiles[1].mean()) == 0.0
