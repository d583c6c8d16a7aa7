"""Host-side sampler properties: modality grouping, per-epoch reshuffle,
and resume-by-skipping semantics (VERDICT r1: resume must not replay
early batches; HF Trainer reshuffles each epoch via set_epoch)."""

import itertools

from halva_tpu.train import sampler


def test_epoch_indices_reshuffles_per_epoch():
    lengths = [(i % 7) + 1 for i in range(64)]  # all-positive: length path
    two = sampler.epoch_indices(lengths, 4, 2, epochs=2.0, seed=0)
    assert len(two) == 128
    e0, e1 = two[:64], two[64:]
    assert sorted(e0) == list(range(64))
    assert sorted(e1) == list(range(64))
    # fresh shuffle each epoch, not a repeat of the same order
    assert e0 != e1
    # deterministic across calls
    again = sampler.epoch_indices(lengths, 4, 2, epochs=2.0, seed=0)
    assert again == two


def test_epoch_indices_fractional_epochs_rounds_up():
    lengths = [1] * 16
    out = sampler.epoch_indices(lengths, 2, 2, epochs=1.5, seed=3)
    assert len(out) == 32  # ceil(1.5) = 2 epochs of indices


def test_resume_skip_matches_uninterrupted_tail():
    """Skipping the first k micro-batches of the stream must yield exactly
    the batches an uninterrupted run would see from step k on."""
    lengths = [(i % 5) + 1 if i % 3 else -((i % 5) + 1) for i in range(48)]
    order = sampler.epoch_indices(lengths, 2, 2, epochs=2.0, seed=1)
    full = list(sampler.host_shard_batches(order, 4, 0, 1))
    resumed = list(
        itertools.islice(sampler.host_shard_batches(order, 4, 0, 1), 3, None)
    )
    assert resumed == full[3:]


def test_host_shard_batches_partition():
    order = list(range(32))
    h0 = list(sampler.host_shard_batches(order, 8, 0, 2))
    h1 = list(sampler.host_shard_batches(order, 8, 1, 2))
    assert len(h0) == len(h1) == 4
    for a, b, start in zip(h0, h1, range(0, 32, 8)):
        assert a + b == order[start : start + 8]
