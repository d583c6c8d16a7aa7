"""CLIP/SigLIP tower parity vs HF vision models (tiny random configs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from halva_tpu.config import ViTConfig
from halva_tpu.models import vit
from halva_tpu.models.convert_hf import clip_vit_from_hf

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = ViTConfig(
    image_size=28,
    patch_size=14,
    hidden_size=32,
    intermediate_size=64,
    num_layers=3,
    num_heads=2,
)


def _hf_clip(cfg: ViTConfig):
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return transformers.CLIPVisionModel(hf_cfg).eval()


@pytest.mark.parametrize("select_layer", [-2, -1, 1])
def test_clip_hidden_state_parity(select_layer):
    model = _hf_clip(CFG)
    params = clip_vit_from_hf(model.state_dict(), CFG)

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 3, 28, 28).astype(np.float32)

    with torch.no_grad():
        out = model(torch.tensor(imgs), output_hidden_states=True)
    ref = out.hidden_states[select_layer].numpy()[:, 1:]  # patch features

    got = vit.encode(
        params,
        CFG,
        jnp.asarray(imgs),
        select_layer=select_layer,
        select_feature="patch",
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_clip_cls_patch_feature():
    model = _hf_clip(CFG)
    params = clip_vit_from_hf(model.state_dict(), CFG)
    rng = np.random.RandomState(1)
    imgs = rng.randn(1, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = model(torch.tensor(imgs), output_hidden_states=True)
    ref = out.hidden_states[-2].numpy()
    got = vit.encode(
        params,
        CFG,
        jnp.asarray(imgs),
        select_layer=-2,
        select_feature="cls_patch",
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_siglip_layout_parity():
    cfg = ViTConfig(
        image_size=28,
        patch_size=14,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=2,
        layer_norm_eps=1e-6,
        use_cls_token=False,
        use_pre_layernorm=False,
        hidden_act="gelu_tanh",
    )
    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.SiglipVisionModel(hf_cfg).eval()
    params = clip_vit_from_hf(model.state_dict(), cfg)

    rng = np.random.RandomState(2)
    imgs = rng.randn(1, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = model(torch.tensor(imgs), output_hidden_states=True)
    ref = out.hidden_states[-2].numpy()
    got = vit.encode(
        params,
        cfg,
        jnp.asarray(imgs),
        select_layer=-2,
        select_feature="patch",
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)
