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


def _make_data(tmp_path, n=16, tags=("closed", "open", "qa")):
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
                "tag": tags[i % len(tags)],
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


def test_train_e2e_packed(tmp_path):
    """Same smoke with pack=True: packed batches through the real CLI
    loop on the 8-device mesh, finite loss, artifacts written."""
    data_path, ref_path, img_dir = _make_data(tmp_path, n=12)
    tok = SPTok()
    proc = ImageProcessor(size=28, crop_size=28)
    ds = HallDataset(
        data_path, ref_path, tok, proc, image_folder=img_dir,
        max_length=128,
    )
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
        pack=True,
        pack_seq_len=256,
    )
    final = train(rcfg, tok, dataset=ds)
    assert final is not None
    out = tmp_path / "out"
    assert (out / "adapter.npz").exists()
    lines = [
        json.loads(l)
        for l in (out / "metrics.jsonl").read_text().splitlines()
    ]
    assert lines and np.isfinite(lines[-1]["loss"])


def test_unknown_preset_raises(tmp_path):
    rcfg = RunConfig(
        model="llava-v1.5-7b-TYPO", output_dir=str(tmp_path / "out")
    )
    with pytest.raises(ValueError, match="unknown LLaVA preset"):
        train(rcfg, tokenizer=None, dataset=None)


def _read_metrics(path):
    return {
        m["step"]: m
        for m in (json.loads(l) for l in open(path).read().splitlines())
    }


def test_resume_mid_run_matches_uninterrupted(tmp_path):
    """Interrupt at micro-step 2, resume, and require the steps-3..4 loss
    trajectory to equal an uninterrupted run's: proves resume restores both
    the optimizer state AND the data-stream position (no replay from 0).

    Tags avoid "qa" so yes/no balancing keeps all 16 samples ->
    2 micro-steps/epoch x 2 epochs = 4 steps."""
    data_path, ref_path, img_dir = _make_data(
        tmp_path, tags=("closed", "open")
    )
    tok = SPTok()
    proc = ImageProcessor(size=28, crop_size=28)

    def make_cfg(out, max_steps=None):
        return RunConfig(
            model="llava-tiny",
            output_dir=str(tmp_path / out),
            data_path=data_path,
            ref_data_path=ref_path,
            image_folder=img_dir,
            epochs=2.0,  # same total => identical lr schedule in all runs
            max_steps=max_steps,
            per_device_batch=1,
            grad_accum_steps=1,
            learning_rate=1e-3,
            lora_r=4,
            max_length=128,
            save_steps=1000,
            mesh_data=8,
        )

    def make_ds():
        return HallDataset(
            data_path, ref_path, tok, proc, image_folder=img_dir,
            max_length=128,
        )

    train(make_cfg("full"), tok, dataset=make_ds())  # 4 micro steps
    train(make_cfg("split", max_steps=2), tok, dataset=make_ds())
    train(make_cfg("split"), tok, dataset=make_ds())  # resumes at step 2

    full = _read_metrics(tmp_path / "full" / "metrics.jsonl")
    split = _read_metrics(tmp_path / "split" / "metrics.jsonl")
    assert set(full) == {1, 2, 3, 4}
    assert {3, 4} <= set(split)
    for step in (3, 4):
        np.testing.assert_allclose(
            split[step]["loss"], full[step]["loss"], rtol=1e-5
        )
        np.testing.assert_allclose(
            split[step]["kl"], full[step]["kl"], rtol=1e-5
        )


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


def test_vila_train_e2e_components_and_ctx_extension(tmp_path):
    """The dedicated VILA surface end-to-end through the shared loop:
    tune_mm_projector trains the projector (not just LoRA),
    model_max_length applies RoPE linear scaling, and per-component
    checkpoints (llm/ vision_tower/ mm_projector/) are exported
    (reference train_halva_vila.py + vila/model/llava_arch.py:138-182)."""
    import numpy as _np

    from halva_tpu.train import vila as vila_lib

    data_path, ref_path, img_dir = _make_data(
        tmp_path, tags=("closed", "open")
    )
    tok = SPTok()
    proc = ImageProcessor(size=28, crop_size=28)
    ds = HallDataset(
        data_path, ref_path, tok, proc, image_folder=img_dir,
        max_length=128,
    )
    rcfg = RunConfig(
        model="llava-tiny",
        output_dir=str(tmp_path / "vila_out"),
        data_path=data_path,
        ref_data_path=ref_path,
        image_folder=img_dir,
        epochs=1.0,
        per_device_batch=1,
        grad_accum_steps=1,
        learning_rate=1e-3,
        lora_r=4,
        max_length=128,
        mesh_data=8,
        tune_mm_projector=True,
        model_max_length=1024,  # > LLAMA_TINY max_position_embeddings
        save_component_dirs=True,
        resume=False,
    )
    # snapshot the random-init projector to prove it trains
    from halva_tpu.config import PRESETS
    from halva_tpu.models import llava as llava_lib
    import jax as _jax
    import jax.numpy as _jnp

    before = llava_lib.init_params(
        _jax.random.PRNGKey(0), PRESETS["llava-tiny"], _jnp.bfloat16
    )["projector"]
    final = train(rcfg, tok, dataset=ds)
    after = final["projector"]
    diffs = [
        float(_np.abs(_np.asarray(a, _np.float32)
                      - _np.asarray(b, _np.float32)).max())
        for a, b in zip(
            _jax.tree.leaves(before), _jax.tree.leaves(after)
        )
    ]
    assert max(diffs) > 0, "projector did not train under tune_mm_projector"

    comp = tmp_path / "vila_out" / "components"
    assert (comp / "llm").is_dir()
    assert (comp / "vision_tower").is_dir()
    assert (comp / "mm_projector").is_dir()

    # round-trip the component checkpoint
    loaded = vila_lib.load_components(str(comp), like=final)
    got = _np.asarray(
        _jax.tree.leaves(loaded["projector"])[0], _np.float32
    )
    want = _np.asarray(_jax.tree.leaves(after)[0], _np.float32)
    _np.testing.assert_allclose(got, want)

    # EVAL-SIDE loading: the eval builder reconstructs config + params
    # from the component dirs alone — no `like=` template (reference
    # vila/model/builder_halva.py:39 + prepare_config_for_eval:260) —
    # and the loaded model generates
    from halva_tpu.models.builder import load_pretrained_model
    from halva_tpu.ops.generate import generate_greedy

    eparams, ecfg = load_pretrained_model(str(comp))
    assert ecfg.llm.rope_scaling is not None  # ctx extension persisted
    assert ecfg.llm.max_position_embeddings == 1024
    b, s = 2, 8
    ids = _np.full((b, s), 5, _np.int32)
    ids[:, 1] = -200
    lens = _np.full((b,), s, _np.int32)
    imgs = _np.zeros(
        (b, 3, ecfg.vision.image_size, ecfg.vision.image_size),
        _np.float32,
    )
    toks, num = generate_greedy(
        eparams, ecfg, _jnp.asarray(ids), _jnp.asarray(imgs),
        _jnp.asarray(lens), max_new_tokens=4, eos_id=2,
        attn_impl="xla",
    )
    assert _np.asarray(toks).shape == (b, 4)


def test_truncated_out_spans_dropped(tmp_path):
    """A max_length shorter than the prompt truncates every <MASK> span
    out of both answers; the sample then has zero alignment signal (the
    loss would be exactly 0) and must be DROPPED like any other
    alignment failure, not silently trained on (found by a verify drive
    with a char-level tokenizer at max_length 128)."""
    data_path, ref_path, img_dir = _make_data(tmp_path)
    tok = SPTok()
    proc = ImageProcessor(size=28, crop_size=28)
    full = HallDataset(
        data_path, ref_path, tok, proc, image_folder=img_dir,
        max_length=128,
    )
    s = full[0]
    assert s is not None and np.count_nonzero(s["pos_signs"]) > 0
    # count prompt tokens BEFORE the first signed token: truncating
    # there leaves zero signs on both sides
    first_sign = int(np.flatnonzero(s["pos_signs"])[0])
    tiny = HallDataset(
        data_path, ref_path, tok, proc, image_folder=img_dir,
        max_length=first_sign,
    )
    assert tiny[0] is None
