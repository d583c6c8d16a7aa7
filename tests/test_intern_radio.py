"""InternViT + RADIO tower parity (VERDICT r1 item 4).

InternViT: tiny torch oracle implementing the reference architecture
(vila/model/multimodal_encoder/intern/modeling_intern_vit.py — RMSNorm
blocks, qk RMSNorm over the full embed dim, LayerScale, fused qkv) checked
against our flag-driven vit.encode.

RADIO (vila/model/multimodal_encoder/radio_encoder.py): the wrapper
semantics — internal input normalization, final-norm'd last-layer patch
features, pixel-unshuffle fold — verified against torch.nn.PixelUnshuffle
and an end-to-end llava forward.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from halva_tpu.config import LlamaConfig, LlavaConfig, ViTConfig
from halva_tpu.models import vit
from halva_tpu.models.convert_hf import intern_vit_from_hf

torch = pytest.importorskip("torch")
nn = torch.nn

INTERN_TINY = ViTConfig(
    image_size=28,
    patch_size=14,
    hidden_size=32,
    intermediate_size=64,
    num_layers=3,
    num_heads=2,
    layer_norm_eps=1e-6,
    use_cls_token=True,
    use_pre_layernorm=False,
    hidden_act="gelu",
    norm_type="rmsnorm",
    qk_norm=True,
    layer_scale=True,
    qkv_bias=False,
)


class _RMSNorm(nn.Module):
    """InternRMSNorm (modeling_intern_vit.py:237-248)."""

    def __init__(self, d, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(d))
        self.eps = eps

    def forward(self, x):
        dt = x.dtype
        x = x.to(torch.float32)
        var = x.pow(2).mean(-1, keepdim=True)
        x = x * torch.rsqrt(var + self.eps)
        return self.weight * x.to(dt)


class _InternLayer(nn.Module):
    def __init__(self, cfg: ViTConfig):
        super().__init__()
        d, h = cfg.hidden_size, cfg.num_heads
        self.h = h
        self.scale = (d // h) ** -0.5
        self.qkv = nn.Linear(d, 3 * d, bias=cfg.qkv_bias)
        self.proj = nn.Linear(d, d)
        self.q_norm = _RMSNorm(d, cfg.layer_norm_eps)
        self.k_norm = _RMSNorm(d, cfg.layer_norm_eps)
        self.norm1 = _RMSNorm(d, cfg.layer_norm_eps)
        self.norm2 = _RMSNorm(d, cfg.layer_norm_eps)
        self.ls1 = nn.Parameter(torch.randn(d) * 0.1 + 1.0)
        self.ls2 = nn.Parameter(torch.randn(d) * 0.1 + 1.0)
        self.fc1 = nn.Linear(d, cfg.intermediate_size)
        self.fc2 = nn.Linear(cfg.intermediate_size, d)

    def attn(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.h, C // self.h)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        # qk RMSNorm over the FULL embed dim (:335-338)
        q = self.q_norm(q.transpose(1, 2).flatten(-2, -1)).view(
            B, N, self.h, C // self.h
        ).transpose(1, 2)
        k = self.k_norm(k.transpose(1, 2).flatten(-2, -1)).view(
            B, N, self.h, C // self.h
        ).transpose(1, 2)
        a = ((q * self.scale) @ k.transpose(-2, -1)).softmax(dim=-1)
        x = (a @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)

    def forward(self, x):
        x = x + self.attn(self.norm1(x)) * self.ls1
        x = x + self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x)))) * self.ls2
        return x


class _InternOracle(nn.Module):
    """Tiny InternVisionModel-equivalent (embeddings + encoder)."""

    def __init__(self, cfg: ViTConfig):
        super().__init__()
        d = cfg.hidden_size

        class Emb(nn.Module):
            def __init__(self):
                super().__init__()
                self.class_embedding = nn.Parameter(torch.randn(1, 1, d))
                self.patch_embedding = nn.Conv2d(
                    3, d, cfg.patch_size, stride=cfg.patch_size
                )
                self.position_embedding = nn.Parameter(
                    torch.randn(1, cfg.num_patches + 1, d)
                )

            def forward(self, px):
                pe = self.patch_embedding(px).flatten(2).transpose(1, 2)
                ce = self.class_embedding.expand(px.shape[0], 1, -1)
                return torch.cat([ce, pe], dim=1) + self.position_embedding

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    _InternLayer(cfg) for _ in range(cfg.num_layers)
                )

            def forward(self, x):
                hs = [x]
                for l in self.layers:
                    x = l(x)
                    hs.append(x)
                return hs

        self.embeddings = Emb()
        self.encoder = Enc()

    def forward(self, px):
        return self.encoder(self.embeddings(px))


def _oracle_state_dict(model):
    """Rename oracle params to the reference InternVisionModel layout
    (attention/mlp live in attn./mlp. submodules there)."""
    renames = {
        ".qkv.": ".attn.qkv.",
        ".proj.": ".attn.proj.",
        ".q_norm.": ".attn.q_norm.",
        ".k_norm.": ".attn.k_norm.",
        ".fc1.": ".mlp.fc1.",
        ".fc2.": ".mlp.fc2.",
    }
    sd = {}
    for k, v in model.state_dict().items():
        for old, new in renames.items():
            k = k.replace(old, new)
        sd[k] = v
    # ls1/ls2 are bare parameters named "...lsN" in the reference
    return sd


@pytest.mark.parametrize("select_layer", [-2, -1])
def test_intern_vit_parity(select_layer):
    torch.manual_seed(0)
    model = _InternOracle(INTERN_TINY).eval()
    params = intern_vit_from_hf(_oracle_state_dict(model), INTERN_TINY)

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        hs = model(torch.tensor(imgs))
    ref = hs[select_layer].numpy()[:, 1:]  # patch features

    got = vit.encode(
        params,
        INTERN_TINY,
        jnp.asarray(imgs),
        select_layer=select_layer,
        select_feature="patch",
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=2e-3)


RADIO_TINY = ViTConfig(
    image_size=32,
    patch_size=8,
    hidden_size=24,
    intermediate_size=48,
    num_layers=2,
    num_heads=2,
    layer_norm_eps=1e-6,
    use_cls_token=True,
    use_pre_layernorm=False,
    hidden_act="gelu",
    num_register_tokens=3,
)


def test_radio_pixel_unshuffle_matches_torch():
    """Our fold must equal torch.nn.PixelUnshuffle on the (B,C,H,W) grid
    (reference applies PixelUnshuffle to spatial features,
    radio_encoder.py:280-287)."""
    import jax

    params = vit.init_params(jax.random.PRNGKey(0), RADIO_TINY)
    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 3, 32, 32).astype(np.float32)

    plain = vit.encode_radio(
        params, RADIO_TINY, jnp.asarray(imgs), pixel_unshuffle=0
    )
    folded = vit.encode_radio(
        params, RADIO_TINY, jnp.asarray(imgs), pixel_unshuffle=2
    )
    b, n, c = np.asarray(plain).shape
    side = RADIO_TINY.image_size // RADIO_TINY.patch_size
    spatial = (
        torch.tensor(np.asarray(plain))
        .reshape(b, side, side, c)
        .permute(0, 3, 1, 2)
    )
    want = torch.nn.PixelUnshuffle(2)(spatial)  # (B, C*4, s/2, s/2)
    want = want.reshape(b, c * 4, (side // 2) ** 2).permute(0, 2, 1)
    np.testing.assert_allclose(
        np.asarray(folded), want.numpy(), atol=1e-5, rtol=1e-5
    )


def test_radio_register_tokens_excluded():
    import jax

    params = vit.init_params(jax.random.PRNGKey(1), RADIO_TINY)
    imgs = np.random.RandomState(2).rand(1, 3, 32, 32).astype(np.float32)
    feats = vit.encode_radio(params, RADIO_TINY, jnp.asarray(imgs))
    assert feats.shape == (1, RADIO_TINY.num_patches, RADIO_TINY.hidden_size)


def test_radio_llava_forward_e2e():
    """RADIO tower drives a full llava forward (feature dim = C*f^2,
    token count quartered by the unshuffle)."""
    import jax

    from halva_tpu.models import llava

    cfg = LlavaConfig(
        llm=LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, max_position_embeddings=256,
        ),
        vision=RADIO_TINY,
        mm_projector_type="linear",
        vision_tower_type="radio",
        radio_pixel_unshuffle=2,
    )
    assert cfg.vision_feature_size == RADIO_TINY.hidden_size * 4
    assert cfg.num_image_tokens == RADIO_TINY.num_patches // 4

    params = llava.init_params(jax.random.PRNGKey(0), cfg)
    ids = np.full((1, 6), 5, np.int32)
    ids[0, 1] = -200
    imgs = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    logits, sp = llava.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(imgs), attn_impl="xla"
    )
    assert logits.shape == (1, 6 + cfg.num_image_tokens - 1, 128)
    assert np.isfinite(np.asarray(logits)).all()
