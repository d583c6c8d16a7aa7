"""Multi-image splice vs a dynamic numpy oracle (K sentinels per row)."""

import numpy as np

import jax
import jax.numpy as jnp

from halva_tpu.config import LLAVA_TINY
from halva_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from halva_tpu.models import llava

CFG = LLAVA_TINY


def _oracle(input_ids, seg, feats, embed_table, t):
    """De-pad, replace each sentinel with its T patches in order."""
    outs = []
    for b in range(input_ids.shape[0]):
        ids = input_ids[b][seg[b] != 0]
        img_i = 0
        emb = []
        for tok in ids:
            if tok == IMAGE_TOKEN_INDEX:
                emb.extend(feats[b, img_i])
                img_i += 1
            else:
                emb.append(embed_table[max(tok, 0)])
        outs.append(np.asarray(emb))
    return outs


def test_multi_image_splice_matches_oracle():
    params = llava.init_params(jax.random.PRNGKey(0), CFG)
    d = CFG.llm.hidden_size
    t = CFG.num_image_tokens
    k = 3
    b, s = 2, 12
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 50, (b, s)).astype(np.int32)
    seg = np.ones((b, s), np.int32)
    # row 0: 2 images; row 1: 3 images + padding
    ids[0, 1] = IMAGE_TOKEN_INDEX
    ids[0, 5] = IMAGE_TOKEN_INDEX
    ids[1, 0] = IMAGE_TOKEN_INDEX
    ids[1, 3] = IMAGE_TOKEN_INDEX
    ids[1, 6] = IMAGE_TOKEN_INDEX
    seg[1, 10:] = 0
    ids[1, 10:] = 0

    feats = rng.randn(b, k, t, d).astype(np.float32)
    sp = llava.splice_image_tokens_multi(
        params, CFG, jnp.asarray(ids), jnp.asarray(feats), jnp.asarray(seg)
    )
    assert sp.embeds.shape == (b, s + k * (t - 1), d)

    table = np.asarray(params["llm"]["embed"]["embedding"])
    want = _oracle(ids, seg, feats, table, t)
    got_seg = np.asarray(sp.segment_ids)
    got = np.asarray(sp.embeds)
    for bi in range(b):
        n = len(want[bi])
        valid = got_seg[bi] != 0
        # row 0 has only 2 images -> third block is masked
        np.testing.assert_allclose(
            got[bi][valid][:n], want[bi], atol=1e-5
        )
        if bi == 0:
            # unused block contributes no valid positions
            assert valid.sum() == n


def test_multi_image_forward_runs():
    params = llava.init_params(jax.random.PRNGKey(1), CFG)
    b, s, k = 1, 8, 2
    ids = np.full((b, s), 5, np.int32)
    ids[0, 1] = IMAGE_TOKEN_INDEX
    ids[0, 4] = IMAGE_TOKEN_INDEX
    imgs = np.zeros(
        (b, k, 3, CFG.vision.image_size, CFG.vision.image_size), np.float32
    )
    logits, sp = llava.forward(
        params, CFG, jnp.asarray(ids), jnp.asarray(imgs), attn_impl="xla"
    )
    t = CFG.num_image_tokens
    assert logits.shape[1] == s + k * (t - 1)
