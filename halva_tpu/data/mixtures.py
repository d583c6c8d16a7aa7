"""General supervised/pretraining data engine: registry + lazy datasets.

Covers the VILA data engine surface (vila/data/datasets_mixture.py:4-44
registry; vila/data/dataset.py lazy dataset classes + build_datasets
"+"-mixture syntax) with TPU-era plumbing: everything yields numpy sample
dicts that the HALVA collator / packing layer consumes, and webdataset
shards go through the native tario reader.

Dataset types:
  "json"     — llava-format instruction json (LazySupervisedDataset);
  "wds"      — tar shards of image+json pairs (LazyWDSDataset, via wids);
  "caption"  — tar shards with txt captions (LazyCCSWebDataset-style).
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import warnings
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class DatasetSpec:
    dataset_name: str
    dataset_type: str = "json"
    data_path: Optional[str] = None
    image_path: Optional[str] = None
    meta_path: Optional[str] = None
    description: Optional[str] = None


DATASETS: Dict[str, DatasetSpec] = {}


def add_dataset(spec: DatasetSpec) -> None:
    if spec.dataset_name in DATASETS:
        warnings.warn(
            f"{spec.dataset_name} already registered; overwriting"
        )
    assert "+" not in spec.dataset_name, "'+' is the mixture separator"
    DATASETS[spec.dataset_name] = spec


def get_dataset_spec(name: str) -> DatasetSpec:
    if name not in DATASETS:
        raise KeyError(
            f"unknown dataset {name!r}; registered: {sorted(DATASETS)}"
        )
    return DATASETS[name]


class LazySupervisedDataset:
    """llava-format json: [{conversations: [{from, value}], image?}].

    Tokenization/encoding is deferred to __getitem__ via the provided
    `encode_fn(sample_dict) -> encoded` (usually
    halva_tpu.train.data.encode_plain_conversation + image load).
    """

    def __init__(
        self,
        data_path: str,
        image_path: Optional[str],
        encode_fn: Callable[[dict, Optional[str]], Any],
    ):
        with open(data_path) as f:
            self.records = json.load(f)
        self.image_path = image_path
        self.encode_fn = encode_fn

    def __len__(self):
        return len(self.records)

    @property
    def modality_lengths(self) -> List[int]:
        out = []
        for r in self.records:
            n = sum(
                len(c["value"].split()) for c in r["conversations"]
            )
            out.append(n if "image" in r else -n)
        return out

    def __getitem__(self, i: int):
        r = self.records[i]
        img = (
            os.path.join(self.image_path, r["image"])
            if "image" in r and self.image_path
            else None
        )
        return self.encode_fn(r, img)


class LazyWDSDataset:
    """webdataset tar shards (image + json per sample) via native wids."""

    def __init__(
        self,
        data_path: str,
        encode_fn: Callable[[dict], Any],
        cache_size: int = 4,
    ):
        from halva_tpu.data.wids import ShardListDataset

        shards = sorted(glob.glob(os.path.join(data_path, "*.tar")))
        if not shards:
            raise FileNotFoundError(f"no tar shards under {data_path}")
        self.ds = ShardListDataset(shards, cache_size=cache_size)
        self.encode_fn = encode_fn

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i: int):
        return self.encode_fn(self.ds[i])


class ConcatDataset:
    """Mixture over member datasets (reference build_datasets result)."""

    def __init__(self, members: Sequence[Any]):
        self.members = list(members)
        self.cum = []
        total = 0
        for m in self.members:
            total += len(m)
            self.cum.append(total)
        self.total = total

    def __len__(self):
        return self.total

    @property
    def modality_lengths(self) -> List[int]:
        out: List[int] = []
        for m in self.members:
            if hasattr(m, "modality_lengths"):
                out.extend(m.modality_lengths)
            else:
                out.extend([1] * len(m))
        return out

    def __getitem__(self, i: int):
        import bisect

        mi = bisect.bisect_right(self.cum, i)
        prev = self.cum[mi - 1] if mi else 0
        return self.members[mi][i - prev]


def build_datasets(
    mixture: str,
    encode_json: Callable[[dict, Optional[str]], Any],
    encode_wds: Optional[Callable[[dict], Any]] = None,
) -> ConcatDataset:
    """"name1+name2" -> ConcatDataset (reference dataset.py:1974-2065)."""
    members = []
    for name in mixture.split("+"):
        spec = get_dataset_spec(name.strip())
        if spec.dataset_type == "json":
            members.append(
                LazySupervisedDataset(
                    spec.data_path, spec.image_path, encode_json
                )
            )
        elif spec.dataset_type in ("wds", "caption", "coyo", "mmc4"):
            assert encode_wds is not None, (
                f"{name}: webdataset mixture needs encode_wds"
            )
            members.append(LazyWDSDataset(spec.data_path, encode_wds))
        else:
            raise ValueError(
                f"unsupported dataset_type {spec.dataset_type!r}"
            )
    return ConcatDataset(members)


def register_default_mixtures(root: str = "./playground/data") -> None:
    """Mirror of the reference's register_datasets_mixtures entries that
    make sense standalone; paths keyed off `root`."""
    add_dataset(
        DatasetSpec(
            "llava_1_5_mm_align",
            "json",
            data_path=os.path.join(
                root, "LLaVA-Pretrain/LLaVA-CC3M-Pretrain-595K.json"
            ),
            image_path=os.path.join(root, "LLaVA-Pretrain/images"),
        )
    )
    add_dataset(
        DatasetSpec(
            "llava_1_5_sft",
            "json",
            data_path=os.path.join(
                root, "llava-1.5/llava_v1_5_mix665k.json"
            ),
            image_path=os.path.join(root, "llava-1.5"),
        )
    )
    add_dataset(
        DatasetSpec(
            "coyo",
            "wds",
            data_path=os.path.join(root, "coyo-700m/shards"),
        )
    )
    add_dataset(
        DatasetSpec(
            "mmc4core",
            "wds",
            data_path=os.path.join(root, "mmc4-core/shards"),
        )
    )
