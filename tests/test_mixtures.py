"""Dataset mixture registry + lazy datasets + '+' mixtures."""

import io
import json
import tarfile

import numpy as np
import pytest

from halva_tpu.data import mixtures as mx


@pytest.fixture(autouse=True)
def clean_registry():
    mx.DATASETS.clear()
    yield
    mx.DATASETS.clear()


def _json_ds(tmp_path, n=4):
    recs = [
        {
            "conversations": [
                {"from": "human", "value": f"q{i}"},
                {"from": "gpt", "value": f"a{i}"},
            ],
            **({"image": f"im{i}.jpg"} if i % 2 == 0 else {}),
        }
        for i in range(n)
    ]
    p = tmp_path / "data.json"
    p.write_text(json.dumps(recs))
    return str(p)


def _wds_ds(tmp_path, n=3):
    d = tmp_path / "shards"
    d.mkdir()
    with tarfile.open(d / "s0.tar", "w") as tf:
        for i in range(n):
            meta = json.dumps({"caption": f"c{i}"}).encode()
            info = tarfile.TarInfo(f"k{i}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))
    return str(d)


def test_registry_and_json_dataset(tmp_path):
    mx.add_dataset(
        mx.DatasetSpec("demo", "json", data_path=_json_ds(tmp_path))
    )
    with pytest.raises(KeyError):
        mx.get_dataset_spec("nope")

    seen = []
    ds = mx.build_datasets(
        "demo", encode_json=lambda r, img: (r, img)
    )
    assert len(ds) == 4
    r, img = ds[0]
    assert r["conversations"][0]["value"] == "q0"
    assert img is None  # no image_path configured
    # modality lengths: image samples positive, text negative
    ml = ds.modality_lengths
    assert ml[0] > 0 and ml[1] < 0


def test_mixture_concat(tmp_path):
    mx.add_dataset(
        mx.DatasetSpec("a", "json", data_path=_json_ds(tmp_path, 2))
    )
    mx.add_dataset(
        mx.DatasetSpec("b", "wds", data_path=_wds_ds(tmp_path, 3))
    )
    ds = mx.build_datasets(
        "a+b",
        encode_json=lambda r, img: ("json", r),
        encode_wds=lambda s: ("wds", s["json"]["caption"]),
    )
    assert len(ds) == 5
    assert ds[0][0] == "json"
    assert ds[2][0] == "wds"
    assert ds[4] == ("wds", "c2")


def test_duplicate_name_warns(tmp_path):
    mx.add_dataset(mx.DatasetSpec("x", "json", data_path="p"))
    with pytest.warns(UserWarning):
        mx.add_dataset(mx.DatasetSpec("x", "json", data_path="p2"))
    with pytest.raises(AssertionError):
        mx.add_dataset(mx.DatasetSpec("a+b", "json", data_path="p"))


# ---------------------------------------------------------------------------
# VILA data-engine variants (reference vila/data/dataset.py:685-1974 and
# dataset_impl/{sam,textocr,hiertext}.py)
# ---------------------------------------------------------------------------

def _png_bytes(seed=0, size=(12, 10)):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = Image.fromarray(
        rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _pkl_shards(tmp_path, records, name="00000"):
    import pickle

    d = tmp_path / "pkl"
    d.mkdir(exist_ok=True)
    (d / f"{name}.pkl").write_bytes(pickle.dumps(records))
    (d / f"{name}.count").write_text(str(len(records)))
    return str(d)


def test_mmc4_interleaved(tmp_path):
    import base64

    rec = {
        "text_list": ["intro text.", "a dog runs.", "the <image> end."],
        "image_info": [
            {"image_base64": base64.b64encode(_png_bytes(1)).decode(),
             "matched_text_index": 1},
            {"image_base64": base64.b64encode(_png_bytes(2)).decode(),
             "matched_text_index": 0},
        ],
        "similarity_matrix": [[0.5], [0.5]],
    }
    path = _pkl_shards(tmp_path, [rec])
    ds = mx.LazyMMC4Dataset(path, encode_fn=lambda r: r)
    assert len(ds) == 1
    out = ds[0]
    # both images spliced, insertion follows text order, pre-existing
    # "<image>" neutralized, eos appended
    assert out["text"].count("<image>") == 2
    assert "<IMAGE>" in out["text"]
    assert out["text"].endswith("</s>")
    assert len(out["images"]) == 2
    assert out["text"].index("<image>intro") < out["text"].index(
        "<image>a dog"
    )
    assert ds.modality_lengths[0] > 0


def test_mmc4_text_only(tmp_path):
    import base64

    rec = {
        "text_list": ["hello there."],
        "image_info": [
            {"image_base64": base64.b64encode(_png_bytes(3)).decode(),
             "matched_text_index": 0}
        ],
        "similarity_matrix": [[1.0]],
    }
    ds = mx.LazyMMC4Dataset(
        _pkl_shards(tmp_path, [rec]), encode_fn=lambda r: r,
        text_only=True,
    )
    out = ds[0]
    assert out["images"] == [] and "<image>" not in out["text"]


def test_coyo_pairs(tmp_path):
    recs = [
        {"image": _png_bytes(i), "caption": f"cap {i}"} for i in range(3)
    ]
    ds = mx.LazyCoyoDataset(
        _pkl_shards(tmp_path, recs), encode_fn=lambda r: r
    )
    assert len(ds) == 3
    out = ds[1]
    assert out["text"] == "<image>cap 1</s>"
    assert len(out["images"]) == 1


def test_video_frames_from_gif_and_dir(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    frames = [
        Image.fromarray(rng.randint(0, 255, (8, 8, 3), dtype=np.uint8))
        for _ in range(5)
    ]
    gif = tmp_path / "v.gif"
    frames[0].save(
        gif, save_all=True, append_images=frames[1:], format="GIF"
    )
    got = mx.extract_video_frames(str(gif), num_frames=4)
    assert len(got) == 4

    d = tmp_path / "framedir"
    d.mkdir()
    for i, f in enumerate(frames):
        f.save(d / f"{i:03d}.png")
    got = mx.extract_video_frames(str(d), num_frames=3)
    assert len(got) == 3

    data = [{"video": "v.gif", "caption": "a clip"}]
    p = tmp_path / "videos.json"
    p.write_text(json.dumps(data))
    ds = mx.LazyVideoDataset(
        str(p), str(tmp_path), encode_fn=lambda r: r, num_frames=4
    )
    out = ds[0]
    assert out["text"].count("<image>") == 4
    assert len(out["images"]) == 4


def test_sam_wds_with_recaption(tmp_path):
    d = tmp_path / "sam"
    d.mkdir()
    with tarfile.open(d / "00000.tar", "w") as tf:
        for i in range(2):
            png = _png_bytes(i)
            info = tarfile.TarInfo(f"sa_{i}.jpg")
            info.size = len(png)
            tf.addfile(info, io.BytesIO(png))
            meta = json.dumps({"caption": f"orig {i}"}).encode()
            info = tarfile.TarInfo(f"sa_{i}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))
    recap = tmp_path / "recap"
    recap.mkdir()
    (recap / "sa_1.txt").write_text("better caption")

    ds = mx.LazySAMWebDataset(str(d), encode_fn=lambda r: r)
    assert len(ds) == 2
    assert ds[0]["text"] == "<image>orig 0</s>"

    ds2 = mx.LazySAMWebDataset(
        str(d), encode_fn=lambda r: r, caption_dir=str(recap)
    )
    assert ds2[1]["text"] == "<image>better caption</s>"


def test_textocr(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "ocr"
    img_dir.mkdir()
    Image.new("RGB", (16, 16)).save(img_dir / "im1.jpg")
    ann = {
        "imgs": {"im1": {"file_name": "im1.jpg"}},
        "imgToAnns": {"im1": [1, 2, 3]},
        "anns": {
            "1": {"utf8_string": "HELLO"},
            "2": {"utf8_string": "."},  # illegible -> dropped
            "3": {"utf8_string": "WORLD"},
        },
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    ds = mx.VILATextOCR(str(p), str(img_dir), encode_fn=lambda r: r)
    out = ds[0]
    assert out["text"].startswith("<image>" + mx.OCR_PROMPT)
    assert out["text"].endswith("HELLO WORLD</s>")


def test_hiertext(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "ht"
    img_dir.mkdir()
    Image.new("RGB", (16, 16)).save(img_dir / "img7.jpg")
    gt = {
        "annotations": [
            {
                "image_id": "img7",
                "paragraphs": [
                    {
                        "lines": [
                            {
                                "text": "two words",
                                "vertical": False,
                                "words": [
                                    {"text": "two", "vertical": False},
                                    {"text": "skip", "vertical": True},
                                    {"text": "words", "vertical": False},
                                ],
                            }
                        ]
                    }
                ],
            }
        ]
    }
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(gt))
    ds = mx.VILAHierText(str(p), str(img_dir), encode_fn=lambda r: r)
    out = ds[0]
    assert out["text"].endswith("two words</s>")


def test_build_datasets_new_types(tmp_path):
    recs = [{"image": _png_bytes(9), "caption": "c"}]
    mx.add_dataset(
        mx.DatasetSpec(
            "coyo_t", "coyo", data_path=_pkl_shards(tmp_path, recs)
        )
    )
    mx.add_dataset(
        mx.DatasetSpec("plain_t", "json", data_path=_json_ds(tmp_path))
    )
    ds = mx.build_datasets(
        "coyo_t+plain_t",
        encode_json=lambda r, img: ("json", r),
        encode_interleaved=lambda r: ("inter", r),
    )
    assert len(ds) == 5
    assert ds[0][0] == "inter"
    assert ds[1][0] == "json"
