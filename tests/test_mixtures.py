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
