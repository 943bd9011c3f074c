"""Dataset discovery + sharding for packed TorchIdx folders.

Replaces the reference's asyncio machinery (lib/data_utils/async_dataset.py)
with a simpler, JAX-native design: datasets are folders of
``{split}/{field}.torch.{idx,bin}`` files; discovery walks the tree
(async_dataset.py:56-127); sharding follows the reference ``Sampler``'s
(rank, world_size) contract (async_dataset.py:458-606) with pad-to-equal
semantics so every host sees the same number of batches (required for
collective-synchronous SPMD eval); prefetch is a thread that overlaps host
preprocessing with device compute (prefetch.py).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .idxbin import TorchIdx

SPLIT_TRAIN = "training"
SPLIT_TEST = "testing"


def find_dataset_folders(
    root: str,
    fields: Sequence[str],
    split: str = SPLIT_TEST,
) -> List[str]:
    """Find folders containing ``{split}/{field}.torch.idx`` for all fields."""
    out = []
    for cur, _dirs, files in sorted(os.walk(root)):
        if os.path.basename(cur) != split:
            continue
        if all(f"{f}.torch.idx" in files for f in fields):
            out.append(cur)
    return out


class PackedDataset:
    """Dict-of-fields random access over one or more packed folders.

    Equivalent of the reference's SingleFolderAsyncDataset + ConcatDataset
    (async_dataset.py:246-413) without the asyncio indirection: TorchIdx
    memory maps already give zero-copy random access, and the OS page cache
    plays the role of the in-memory preload.
    """

    def __init__(
        self,
        folders: Sequence[str],
        fields: Sequence[str],
        preload: bool = False,
    ):
        """``preload=True`` loads every .bin payload into RAM up front (the
        reference's InMemoryTorchBin mode, async_dataset.py:130-150)."""
        self.fields = list(fields)
        self._readers: List[Dict[str, TorchIdx]] = []
        self._cum: List[int] = [0]
        for folder in folders:
            readers = {
                f: TorchIdx(os.path.join(folder, f + ".torch.idx")) for f in fields
            }
            if preload:
                for r in readers.values():
                    r.preload()
            lens = {len(r) for r in readers.values()}
            assert len(lens) == 1, f"field length mismatch in {folder}"
            self._readers.append(readers)
            self._cum.append(self._cum[-1] + lens.pop())

    def __len__(self) -> int:
        return self._cum[-1]

    def __getitem__(self, i: int) -> Dict[str, object]:
        if i < 0:
            i += len(self)
        fi = int(np.searchsorted(self._cum, i, side="right")) - 1
        local = i - self._cum[fi]
        return {f: r[local] for f, r in self._readers[fi].items()}


class ShardSampler:
    """Deterministic (rank, world_size) sharding with pad-to-equal and
    io-worker sub-sharding.

    Matches the contract of the reference ``Sampler``
    (async_dataset.py:458-606): indices are padded (or dropped) to a
    multiple of world_size so every rank yields the same count (keeps SPMD
    collectives in lockstep), strided across ranks, then strided again
    across this rank's io workers (async_dataset.py:559-563). Shuffling is
    (seed + epoch)-keyed like the reference's epoch generator
    (async_dataset.py:531-535); call ``set_epoch`` between passes.
    """

    def __init__(
        self,
        n: int,
        rank: int = 0,
        world_size: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
        worker: int = 0,
        num_workers: int = 1,
    ):
        assert 0 <= rank < world_size
        assert 0 <= worker < num_workers
        self.n = n
        self.rank = rank
        self.world_size = world_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.worker = worker
        self.num_workers = num_workers
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    @property
    def indices(self) -> np.ndarray:
        idx = np.arange(self.n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + self.epoch).permutation(self.n)
        r = len(idx) % self.world_size
        if r:
            if self.drop_remainder:
                idx = idx[: len(idx) - r]
            else:
                idx = np.concatenate([idx, idx[: self.world_size - r]])
        shard = idx[self.rank :: self.world_size]
        return shard[self.worker :: self.num_workers]

    def __iter__(self):
        return iter(self.indices.tolist())

    def __len__(self):
        per_rank = (
            self.n // self.world_size
            if self.drop_remainder
            else -(-self.n // self.world_size)
        )
        return len(range(self.worker, per_rank, self.num_workers))


def subsample_indices(n: int, fraction: float, seed: int = 0) -> np.ndarray:
    """Deterministic subsample of ``fraction`` of n indices (sorted).

    Matches the reference's seed-0 deterministic subsample contract
    (async_dataset.py:416-455): same n/fraction/seed -> same subset.
    """
    k = max(1, int(round(n * fraction)))
    rng = np.random.default_rng(seed)
    return np.sort(rng.permutation(n)[:k])


class MappedDataset:
    """Lazy item-wise map preserving len/indexing (reference
    dataset_util.map_dataset, dataset_util.py:37-156)."""

    def __init__(self, base, fn):
        self.base = base
        self.fn = fn

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        return self.fn(self.base[i])


def map_dataset(base, fn) -> MappedDataset:
    return MappedDataset(base, fn)


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of field dicts into batched arrays (bundles.collate
    analog, reference bundles.py:155-206)."""
    out: Dict[str, np.ndarray] = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        out[k] = np.stack(vals) if isinstance(vals[0], np.ndarray) else vals
    return out
