"""Static-shape image-token splice vs a dynamic numpy oracle that mirrors
the reference's prepare_inputs_labels_for_multimodal_signed semantics
(llava/model/llava_arch.py:229-394): de-pad, split at the -200 sentinel,
concatenate [pre, image, post], right-pad."""

import numpy as np

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAVA_TINY
from halva_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from halva_tpu.models import llama, llava


def _oracle(input_ids, labels, signs, seg, img_feats, embed_table, s_out):
    """Reference-semantics dynamic splice in numpy."""
    b, s = input_ids.shape
    t, d = img_feats.shape[1:]
    out_e = np.zeros((b, s_out, d), np.float32)
    out_l = np.full((b, s_out), IGNORE_INDEX, np.int32)
    out_sg = np.zeros((b, s_out), np.int32)
    out_seg = np.zeros((b, s_out), np.int32)
    for i in range(b):
        valid = seg[i] != 0
        ids = input_ids[i][valid]
        lb = labels[i][valid]
        sg = signs[i][valid]
        pos = np.where(ids == IMAGE_TOKEN_INDEX)[0]
        if len(pos) == 0:
            emb = embed_table[np.clip(ids, 0, None)]
            n = len(ids)
            out_e[i, :n] = emb
            out_l[i, :n] = lb
            out_sg[i, :n] = sg
            out_seg[i, :n] = 1
            continue
        p = pos[0]
        pieces_e = [
            embed_table[np.clip(ids[:p], 0, None)],
            img_feats[i],
            embed_table[np.clip(ids[p + 1 :], 0, None)],
        ]
        pieces_l = [lb[:p], np.full(t, IGNORE_INDEX, np.int32), lb[p + 1 :]]
        pieces_s = [sg[:p], np.zeros(t, np.int32), sg[p + 1 :]]
        e = np.concatenate(pieces_e)
        n = e.shape[0]
        out_e[i, :n] = e
        out_l[i, :n] = np.concatenate(pieces_l)
        out_sg[i, :n] = np.concatenate(pieces_s)
        out_seg[i, :n] = 1
    return out_e, out_l, out_sg, out_seg


def test_splice_matches_oracle():
    cfg = LLAVA_TINY
    key = jax.random.PRNGKey(0)
    params = llava.init_params(key, cfg)
    d = cfg.llm.hidden_size
    t = cfg.num_image_tokens
    b, s = 3, 11
    rng = np.random.RandomState(0)

    input_ids = rng.randint(5, 50, (b, s)).astype(np.int32)
    seg = np.ones((b, s), np.int32)
    # row 0: image at pos 2, padding after 9
    input_ids[0, 2] = IMAGE_TOKEN_INDEX
    seg[0, 9:] = 0
    input_ids[0, 9:] = 0
    # row 1: image at pos 0, full length
    input_ids[1, 0] = IMAGE_TOKEN_INDEX
    # row 2: no image, padding after 6
    seg[2, 6:] = 0
    input_ids[2, 6:] = 0

    labels = rng.randint(5, 50, (b, s)).astype(np.int32)
    labels[seg == 0] = IGNORE_INDEX
    labels[input_ids == IMAGE_TOKEN_INDEX] = IGNORE_INDEX
    signs = rng.randint(0, 3, (b, s)).astype(np.int32)
    signs[seg == 0] = 0

    img_feats = rng.randn(b, t, d).astype(np.float32)

    sp = llava.splice_image_tokens(
        params,
        cfg,
        jnp.asarray(input_ids),
        jnp.asarray(img_feats),
        jnp.asarray(seg),
        jnp.asarray(labels),
        jnp.asarray(signs),
    )
    embed_table = np.asarray(params["llm"]["embed"]["embedding"])
    want_e, want_l, want_sg, want_seg = _oracle(
        input_ids, labels, signs, seg, img_feats, embed_table, s + t - 1
    )

    got_seg = np.asarray(sp.segment_ids)
    np.testing.assert_array_equal(got_seg != 0, want_seg != 0)
    m = want_seg != 0
    np.testing.assert_allclose(
        np.asarray(sp.embeds)[m], want_e[m], atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(sp.labels)[m], want_l[m])
    np.testing.assert_array_equal(np.asarray(sp.signs)[m], want_sg[m])


def test_splice_positions_are_contiguous():
    cfg = LLAVA_TINY
    params = llava.init_params(jax.random.PRNGKey(1), cfg)
    t = cfg.num_image_tokens
    ids = np.array([[1, IMAGE_TOKEN_INDEX, 7, 8]], np.int32)
    feats = np.ones((1, t, cfg.llm.hidden_size), np.float32)
    sp = llava.splice_image_tokens(
        params, cfg, jnp.asarray(ids), jnp.asarray(feats)
    )
    assert sp.embeds.shape[1] == 4 + t - 1
    np.testing.assert_array_equal(
        np.asarray(sp.positions)[0], np.arange(4 + t - 1)
    )


def test_forward_end_to_end_shapes():
    cfg = LLAVA_TINY
    params = llava.init_params(jax.random.PRNGKey(2), cfg)
    t = cfg.num_image_tokens
    b, s = 2, 8
    ids = np.full((b, s), 5, np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    imgs = np.zeros(
        (b, 3, cfg.vision.image_size, cfg.vision.image_size), np.float32
    )
    logits, sp = llava.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(imgs), attn_impl="xla"
    )
    assert logits.shape == (b, s + t - 1, cfg.llm.vocab_size)
    assert sp.labels.shape == (b, s + t - 1)


def test_vision_tower_is_frozen():
    """Gradients must not flow into the vision tower (reference @no_grad)."""
    cfg = LLAVA_TINY
    params = llava.init_params(jax.random.PRNGKey(3), cfg)
    t = cfg.num_image_tokens
    ids = np.full((1, 6), 5, np.int32)
    ids[0, 1] = IMAGE_TOKEN_INDEX
    imgs = np.ones(
        (1, 3, cfg.vision.image_size, cfg.vision.image_size), np.float32
    )

    def loss_fn(p):
        logits, _ = llava.forward(
            p, cfg, jnp.asarray(ids), jnp.asarray(imgs), attn_impl="xla"
        )
        return jnp.sum(logits**2)

    grads = jax.grad(loss_fn)(params)
    vis_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["vision"])
    )
    proj_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["projector"])
    )
    assert vis_norm == 0.0
    assert proj_norm > 0.0
