"""End-to-end training smoke: synthetic HALVA data on disk -> train loop
-> metrics + adapter + checkpoint artifacts, on the 8-device CPU mesh."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from halva_tpu.mm_utils import ImageProcessor
from halva_tpu.train.data import HallDataset
from halva_tpu.train.run import RunConfig, train

from test_data_pipeline import SPTok


def _make_data(tmp_path, n=16):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    samples = []
    refs = []
    for i in range(n):
        name = f"im_{i}.png"
        Image.fromarray(
            rng.randint(0, 255, (40, 30, 3), dtype=np.uint8)
        ).save(img_dir / name)
        samples.append(
            {
                "id": i,
                "tag": ["closed", "open", "qa"][i % 3],
                "raw_answer": ["Yes", "No"][i % 2],
                "image": name,
                "question": "<image>\nWhat do you see here?",
                "correct_answer": "I see a red car and two dogs.",
                "correct_answer_masked": (
                    "I see <MASK>a red car</MASK> and "
                    "<MASK>two dogs </MASK>."
                ),
                "hallucinated_answer": "I see a blue bike and a cat.",
                "hallucinated_answer_masked": (
                    "I see <MASK>a blue bike</MASK> and "
                    "<MASK>a cat </MASK>."
                ),
            }
        )
        refs.append(
            {
                "conversations": [
                    {"from": "human", "value": "<image>\nDescribe."},
                    {"from": "gpt", "value": "A small test image."},
                ],
                "image": name,
            }
        )
    data_path = tmp_path / "data.json"
    ref_path = tmp_path / "ref.json"
    data_path.write_text(json.dumps(samples))
    ref_path.write_text(json.dumps(refs))
    return str(data_path), str(ref_path), str(img_dir)


def test_train_e2e_smoke(tmp_path):
    data_path, ref_path, img_dir = _make_data(tmp_path)
    tok = SPTok()
    proc = ImageProcessor(size=28, crop_size=28)
    ds = HallDataset(
        data_path, ref_path, tok, proc, image_folder=img_dir,
        max_length=128,
    )
    assert len(ds) > 0
    s = ds[0]
    assert s is not None
    assert s["image"].shape == (3, 28, 28)

    rcfg = RunConfig(
        model="llava-tiny",
        output_dir=str(tmp_path / "out"),
        data_path=data_path,
        ref_data_path=ref_path,
        image_folder=img_dir,
        epochs=1.0,
        per_device_batch=1,
        grad_accum_steps=1,
        learning_rate=1e-4,
        lora_r=4,
        lora_alpha=8.0,
        max_length=128,
        save_steps=1000,
        mesh_data=8,
    )
    final = train(rcfg, tok, dataset=ds)
    assert final is not None

    out = tmp_path / "out"
    assert (out / "adapter.npz").exists()
    assert (out / "metrics.jsonl").exists()
    lines = [
        json.loads(l)
        for l in (out / "metrics.jsonl").read_text().splitlines()
    ]
    assert lines and np.isfinite(lines[-1]["loss"])
    ckpts = os.listdir(out / "checkpoints")
    assert ckpts


def test_train_resume(tmp_path):
    data_path, ref_path, img_dir = _make_data(tmp_path)
    tok = SPTok()
    proc = ImageProcessor(size=28, crop_size=28)
    ds = HallDataset(
        data_path, ref_path, tok, proc, image_folder=img_dir,
        max_length=128,
    )
    rcfg = RunConfig(
        model="llava-tiny",
        output_dir=str(tmp_path / "out2"),
        data_path=data_path,
        ref_data_path=ref_path,
        image_folder=img_dir,
        epochs=1.0,
        per_device_batch=1,
        grad_accum_steps=1,
        lora_r=4,
        max_length=128,
        mesh_data=8,
    )
    train(rcfg, tok, dataset=ds)
    # second invocation restores the final checkpoint and finishes
    # immediately (step counter already at the end)
    final = train(rcfg, tok, dataset=ds)
    assert final is not None
