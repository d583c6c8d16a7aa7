"""Weight-delta tree ops: exact round trip, vocab-extension slabs,
target-only passthrough, and the base-only refusal — the reference's
make_delta/apply_delta contract (vila/model/make_delta.py:28-44,
apply_delta.py:31-45) as pytree arithmetic."""

import numpy as np
import pytest

from halva_tpu.utils.delta import apply_delta, consolidate, make_delta


def _tree(rng, vocab=32):
    return {
        "llm": {
            "embed": {
                "embedding": rng.randn(vocab, 8).astype(np.float16) * 0.1
            },
            "layers": {"attn": {"wq": {"kernel": rng.randn(2, 8, 8).astype("bfloat16")}}},
        },
        "proj": {"kernel": rng.randn(8, 8).astype(np.float32)},
    }


def _assert_ulp1(out, ref):
    """Equal or adjacent representable values (<=1 ulp), elementwise."""

    def key(x):
        # sign-magnitude bits -> monotone integer ordering
        b = np.asarray(x).view(np.uint16).astype(np.int32).ravel()
        return np.where(b & 0x8000, -(b & 0x7FFF), b & 0x7FFF)

    d = np.abs(key(out) - key(ref))
    assert np.all(d <= 1), d.max()


def test_round_trip_bf16_within_ulp():
    rng = np.random.RandomState(0)
    base = _tree(rng)
    target = _tree(rng)
    delta = make_delta(target, base)
    # sub-fp32 leaves store fp32 deltas -> round trip <= 1 target ulp
    # (exact when the difference is fp32-representable; the reference's
    # in-place fp16 pipeline is strictly looser, apply_delta.py:38-44)
    assert delta["llm"]["embed"]["embedding"].dtype == np.float32
    out = apply_delta(delta, base)
    _assert_ulp1(
        out["llm"]["embed"]["embedding"],
        target["llm"]["embed"]["embedding"],
    )
    _assert_ulp1(
        out["llm"]["layers"]["attn"]["wq"]["kernel"],
        target["llm"]["layers"]["attn"]["wq"]["kernel"],
    )
    # fp32 leaves carry fp64 deltas: exact here too
    np.testing.assert_array_equal(
        out["proj"]["kernel"], target["proj"]["kernel"]
    )
    assert out["proj"]["kernel"].dtype == np.float32


def test_vocab_extension_slab():
    rng = np.random.RandomState(1)
    base = _tree(rng, vocab=32)
    target = _tree(rng, vocab=36)  # 4 new token rows (vocab.extend)
    delta = make_delta(target, base)
    # extension rows ride verbatim in the delta
    np.testing.assert_array_equal(
        delta["llm"]["embed"]["embedding"][32:],
        target["llm"]["embed"]["embedding"][32:].astype(np.float32),
    )
    out = apply_delta(delta, base)
    assert out["llm"]["embed"]["embedding"].shape == (36, 8)
    # extension rows round-trip EXACTLY (no base addend); slab <= 1 ulp
    np.testing.assert_array_equal(
        out["llm"]["embed"]["embedding"][32:].view(np.uint16),
        target["llm"]["embed"]["embedding"][32:].view(np.uint16),
    )
    _assert_ulp1(
        out["llm"]["embed"]["embedding"][:32],
        target["llm"]["embed"]["embedding"][:32],
    )


def test_target_only_passthrough_and_base_only_refused():
    rng = np.random.RandomState(2)
    base = _tree(rng)
    target = _tree(rng)
    target["new_head"] = {"kernel": rng.randn(4, 4).astype(np.float32)}
    delta = make_delta(target, base)
    np.testing.assert_array_equal(
        delta["new_head"]["kernel"], target["new_head"]["kernel"]
    )
    extra = dict(base)
    extra["only_in_base"] = {"w": np.zeros(3, np.float32)}
    with pytest.raises(ValueError, match="absent from target"):
        make_delta(target, extra)
    with pytest.raises(ValueError, match="absent from delta"):
        apply_delta(delta, extra)


def test_shrunk_dim_refused():
    rng = np.random.RandomState(3)
    base = _tree(rng, vocab=36)
    target = _tree(rng, vocab=32)
    with pytest.raises(ValueError, match="does not extend"):
        make_delta(target, base)


def test_consolidate_round_trip(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from halva_tpu.train.checkpoint import load_params, save_params

    rng = np.random.RandomState(4)
    tree = _tree(rng)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    save_params(src, tree)
    consolidate(src, dst)
    out = load_params(dst)
    np.testing.assert_array_equal(
        np.asarray(out["proj"]["kernel"]), tree["proj"]["kernel"]
    )
