"""Image preprocessing bit-parity vs HF CLIPImageProcessor, and
tokenizer_image_token contract tests with a fake tokenizer."""

import numpy as np
import pytest
from PIL import Image

from halva_tpu.constants import IMAGE_TOKEN_INDEX
from halva_tpu.mm_utils import (
    ImageProcessor,
    expand2square,
    process_images,
    tokenizer_image_token,
)


class FakeTok:
    """Word-level tokenizer mimicking HF sentencepiece interface: emits a
    BOS then one id per whitespace token (hash-based)."""

    bos_token_id = 1

    def __call__(self, text):
        ids = [self.bos_token_id] + [
            (hash(w) % 1000) + 10 for w in text.split()
        ]

        class R:
            input_ids = ids

        return R()


def test_tokenizer_image_token_single_image():
    tok = FakeTok()
    prompt = "hello <image> world"
    ids = tokenizer_image_token(prompt, tok)
    # bos + "hello" + sentinel + "world"
    direct = tok("hello ").input_ids
    assert ids[0] == tok.bos_token_id
    assert IMAGE_TOKEN_INDEX in ids
    img_pos = ids.index(IMAGE_TOKEN_INDEX)
    assert ids[1:img_pos] == direct[1:]
    tail = tok(" world").input_ids
    assert ids[img_pos + 1 :] == tail[1:]


def test_tokenizer_image_token_no_image():
    tok = FakeTok()
    ids = tokenizer_image_token("just text", tok)
    assert ids == tok("just text").input_ids


def test_tokenizer_image_token_counts_match_reference_contract():
    # reference behavior: N markers -> N sentinels, single leading bos
    tok = FakeTok()
    ids = tokenizer_image_token("<image> a <image> b", tok)
    assert ids.count(IMAGE_TOKEN_INDEX) == 2
    assert ids.count(tok.bos_token_id) == 1


def test_expand2square():
    img = Image.new("RGB", (10, 4), (255, 0, 0))
    sq = expand2square(img, (0, 0, 0))
    assert sq.size == (10, 10)
    arr = np.asarray(sq)
    assert (arr[5, 5] == [255, 0, 0]).all()  # center row keeps content
    assert (arr[0, 0] == [0, 0, 0]).all()  # padded area is background
    # already-square passthrough
    img2 = Image.new("RGB", (7, 7))
    assert expand2square(img2, (0, 0, 0)) is img2


@pytest.mark.parametrize("size", [(48, 30), (336, 336), (500, 200)])
def test_clip_preprocess_parity_with_hf(size):
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPImageProcessor

    hf = CLIPImageProcessor(
        do_resize=True,
        size={"shortest_edge": 336},
        do_center_crop=True,
        crop_size={"height": 336, "width": 336},
        do_rescale=True,
        do_normalize=True,
        do_convert_rgb=True,
    )
    ours = ImageProcessor(size=336, crop_size=336)

    rng = np.random.RandomState(0)
    img = Image.fromarray(
        rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)
    )
    ref = hf.preprocess(img, return_tensors="np")["pixel_values"][0]
    got = ours(img)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_process_images_pad_mode():
    proc = ImageProcessor(size=336, crop_size=336)
    img = Image.new("RGB", (100, 50), (10, 20, 30))
    out = process_images([img], proc, image_aspect_ratio="pad")
    assert out.shape == (1, 3, 336, 336)
    # corners should be the mean background color, normalized ~0
    assert abs(out[0, 0, 0, 0]) < 0.1
