"""Native tar reader + wids-style dataset over generated shards."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from halva_tpu.data.tario import IndexedTar, _get_lib
from halva_tpu.data.wids import (
    DistributedChunkedSampler,
    LRUShards,
    ShardListDataset,
)


def _make_shard(path, n, start=0, long_name=False):
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            key = f"sample{i:04d}"
            if long_name and i == start:
                key = "x" * 120 + key  # force GNU longname header
            img = np.random.RandomState(i).bytes(100 + i)
            info = tarfile.TarInfo(f"{key}.jpg")
            info.size = len(img)
            tf.addfile(info, io.BytesIO(img))
            meta = json.dumps({"id": i}).encode()
            info = tarfile.TarInfo(f"{key}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))
    return path


def test_native_lib_builds():
    assert _get_lib() is not None, "g++ build of tario failed"


def test_indexed_tar_roundtrip(tmp_path):
    p = _make_shard(str(tmp_path / "a.tar"), 5)
    t = IndexedTar(p)
    assert len(t) == 10  # 5 jpg + 5 json
    names = t.names()
    assert "sample0000.jpg" in names
    data = t.get_by_name("sample0003.jpg")
    assert data == np.random.RandomState(3).bytes(103)
    meta = json.loads(t.get_by_name("sample0002.json"))
    assert meta == {"id": 2}
    t.close()


def test_indexed_tar_gnu_longname(tmp_path):
    p = _make_shard(str(tmp_path / "l.tar"), 2, long_name=True)
    t = IndexedTar(p)
    long = [n for n in t.names() if len(n) > 100]
    assert long, "longname member missing"
    assert t.get_by_name(long[0]) == np.random.RandomState(0).bytes(100)


def test_fallback_matches_native(tmp_path, monkeypatch):
    p = _make_shard(str(tmp_path / "b.tar"), 3)
    native = IndexedTar(p)
    import halva_tpu.data.tario as tario_mod

    monkeypatch.setattr(tario_mod, "_get_lib", lambda: None)
    fallback = tario_mod.IndexedTar(p)
    assert native.names() == fallback.names()
    for i in range(len(native)):
        assert native.get_by_index(i) == fallback.get_by_index(i)


def test_shard_list_dataset(tmp_path):
    p1 = _make_shard(str(tmp_path / "s1.tar"), 4, start=0)
    p2 = _make_shard(str(tmp_path / "s2.tar"), 6, start=4)
    ds = ShardListDataset([p1, p2], cache_size=1)
    assert len(ds) == 10
    s = ds[0]
    assert s["json"] == {"id": 0}
    assert isinstance(s["jpg"], bytes)
    s = ds[7]  # crosses into shard 2 (evicts shard 1 in the LRU)
    assert s["json"] == {"id": 7}
    s = ds[1]
    assert s["json"] == {"id": 1}
    with pytest.raises(IndexError):
        ds[10]


def test_distributed_chunked_sampler():
    total = 103
    seen = []
    for rank in range(4):
        s = DistributedChunkedSampler(total, rank, 4, seed=1)
        idx = list(s)
        # contiguous chunk ownership
        assert set(idx) == set(
            range(s.start, s.end)
        )
        seen.extend(idx)
    assert sorted(seen) == list(range(total))
    # epoch changes the in-chunk order deterministically
    s0 = DistributedChunkedSampler(total, 0, 4, seed=1)
    a = list(s0)
    s0.set_epoch(1)
    b = list(s0)
    assert a != b and sorted(a) == sorted(b)
