"""Data layer tests: TorchIdx round trips, sharding, prefetch."""

import numpy as np
import pytest

from absolutetrack_tpu.data import (
    PackedDataset,
    PrefetchIterator,
    ShardSampler,
    TorchIdx,
    find_dataset_folders,
    write_torch_idx,
)
from absolutetrack_tpu.data.dataset import collate


class TestIdxBin:
    def test_uniform_round_trip(self, tmp_path):
        rng = np.random.default_rng(0)
        elems = [rng.standard_normal((3, 4)).astype(np.float32) for _ in range(5)]
        p = str(tmp_path / "field.torch.idx")
        write_torch_idx(p, elems)
        r = TorchIdx(p)
        assert len(r) == 5
        assert r.is_uniform and r.shape == (5, 3, 4)
        for i in range(5):
            np.testing.assert_array_equal(r[i], elems[i])
        np.testing.assert_array_equal(r.as_array(), np.stack(elems))

    def test_non_uniform_round_trip(self, tmp_path):
        elems = [np.arange(n, dtype=np.int64) for n in (3, 1, 7)]
        p = str(tmp_path / "ragged.torch.idx")
        write_torch_idx(p, elems)
        r = TorchIdx(p)
        assert not r.is_uniform
        for i, e in enumerate(elems):
            np.testing.assert_array_equal(r[i], e)
            assert r.element_shape(i) == e.shape

    def test_uint8_round_trip(self, tmp_path):
        elems = [np.full((2, 2), i, np.uint8) for i in range(3)]
        p = str(tmp_path / "mono.torch.idx")
        write_torch_idx(p, elems)
        r = TorchIdx(p)
        assert r.dtype == np.uint8
        np.testing.assert_array_equal(r[2], elems[2])

    def test_msgpack_objects(self, tmp_path):
        objs = [{"a": 1, "b": [1.5, 2.5]}, {"a": 2, "c": "hi"}]
        p = str(tmp_path / "labels.torch.idx")
        write_torch_idx(p, objs)
        r = TorchIdx(p)
        assert r.is_object
        assert r[0] == objs[0]
        assert r[1] == objs[1]

    def test_bad_magic_raises(self, tmp_path):
        p = tmp_path / "bad.torch.idx"
        h = np.zeros(10, np.int64)
        h[0], h[1] = 12345, 1  # wrong magic for version 1
        h.tofile(str(p))
        with pytest.raises(ValueError):
            TorchIdx(str(p))
        h[0], h[1] = 7, 0  # v0 requires magic 0
        h.tofile(str(p))
        with pytest.raises(ValueError):
            TorchIdx(str(p))
        h[0], h[1] = 0, 2  # unsupported version
        h.tofile(str(p))
        with pytest.raises(ValueError):
            TorchIdx(str(p))

    def test_v0_legacy_vintage(self, tmp_path):
        """Version-0 files (magic 0) are accepted like the reference reader
        (lib/data_utils/idxbinfile.py:138-140)."""
        rng = np.random.default_rng(1)
        elems = [rng.standard_normal((2, 3)).astype(np.float32) for _ in range(4)]
        p = str(tmp_path / "field.torch.idx")
        write_torch_idx(p, elems)
        h = np.fromfile(p, np.int64)
        h[0], h[1] = 0, 0
        h.tofile(p)
        r = TorchIdx(p)
        assert r.is_uniform and r.shape == (4, 2, 3)
        for i in range(4):
            np.testing.assert_array_equal(r[i], elems[i])
        np.testing.assert_array_equal(r.as_array(), np.stack(elems))

    def test_uniform_nonzero_first_offset(self, tmp_path):
        """Uniform files whose first data offset is nonzero (shared .bin with
        a prefix) keep the zero-copy fast path, like the reference's stored
        byte offsets (idxbinfile.py:176-188)."""
        elems = [np.full((2, 2), i, np.float32) for i in range(3)]
        p = str(tmp_path / "field.torch.idx")
        write_torch_idx(p, elems)
        # Prepend one element's worth of garbage to the .bin and shift offsets.
        h = np.fromfile(p, np.int64)
        n = int(h[4])
        data_ofs_start = 6 + n + 1
        h[data_ofs_start : data_ofs_start + n + 1] += 4  # 4 floats
        h.tofile(p)
        binp = p[:-4] + ".bin"
        payload = open(binp, "rb").read()
        with open(binp, "wb") as f:
            f.write(b"\xff" * 16 + payload)
        r = TorchIdx(p)
        assert r.is_uniform and r.shape == (3, 2, 2)
        for i in range(3):
            np.testing.assert_array_equal(r[i], elems[i])
        np.testing.assert_array_equal(r.as_array(), np.stack(elems))


class TestDataset:
    def _make_folder(self, root, name, n):
        d = root / name / "testing"
        d.mkdir(parents=True)
        write_torch_idx(
            str(d / "mono.torch.idx"),
            [np.full((4, 4), i, np.uint8) for i in range(n)],
        )
        write_torch_idx(str(d / "labels.torch.idx"), [{"i": i} for i in range(n)])
        return str(d)

    def test_packed_dataset_v0_vintage(self, tmp_path):
        d = self._make_folder(tmp_path, "rec_v0", 3)
        import os

        for name in ("mono.torch.idx", "labels.torch.idx"):
            p = os.path.join(d, name)
            h = np.fromfile(p, np.int64)
            h[0], h[1] = 0, 0
            h.tofile(p)
        ds = PackedDataset([d], ["mono", "labels"])
        assert len(ds) == 3
        s = ds[2]
        assert s["labels"]["i"] == 2
        assert s["mono"][0, 0] == 2

    def test_discovery_and_concat(self, tmp_path):
        self._make_folder(tmp_path, "rec_a", 3)
        self._make_folder(tmp_path, "rec_b", 2)
        folders = find_dataset_folders(str(tmp_path), ["mono", "labels"])
        assert len(folders) == 2
        ds = PackedDataset(folders, ["mono", "labels"])
        assert len(ds) == 5
        s = ds[4]
        assert s["labels"]["i"] == 1
        assert s["mono"][0, 0] == 1

    def test_shard_sampler_covers_all_equally(self):
        world = 3
        shards = [ShardSampler(10, r, world) for r in range(world)]
        lens = {len(s) for s in shards}
        assert lens == {4}  # ceil(10/3), padded
        seen = set()
        for s in shards:
            seen.update(s.indices.tolist())
        assert seen == set(range(10))

    def test_shard_sampler_deterministic_shuffle(self):
        a = ShardSampler(20, 0, 2, shuffle=True, seed=7)
        b = ShardSampler(20, 0, 2, shuffle=True, seed=7)
        np.testing.assert_array_equal(a.indices, b.indices)

    def test_collate(self):
        batch = collate(
            [
                {"x": np.ones((2,)), "y": {"i": 0}},
                {"x": np.zeros((2,)), "y": {"i": 1}},
            ]
        )
        assert batch["x"].shape == (2, 2)
        assert batch["y"] == [{"i": 0}, {"i": 1}]


class TestPrefetch:
    def test_order_preserved(self):
        it = PrefetchIterator(range(50), max_prefetch=4)
        assert list(it) == list(range(50))

    def test_transform_applied(self):
        it = PrefetchIterator(range(5), transform=lambda x: x * 2)
        assert list(it) == [0, 2, 4, 6, 8]

    def test_exception_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("boom")

        it = PrefetchIterator(gen())
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="boom"):
            for _ in it:
                pass

    def test_close_stops_worker(self):
        import itertools

        it = PrefetchIterator(itertools.count(), max_prefetch=2)
        assert next(it) == 0
        it.close()  # must not hang


class TestWorkerSubSharding:
    def test_workers_partition_rank_shard(self):
        """rank shard = disjoint union of its io-worker sub-shards, equal
        sizes (reference async_dataset.py:559-563)."""
        full = ShardSampler(24, rank=1, world_size=2)
        parts = [
            ShardSampler(24, rank=1, world_size=2, worker=w, num_workers=3)
            for w in range(3)
        ]
        assert {len(p) for p in parts} == {4}
        assert sum(len(p) for p in parts) == len(full)
        seen = np.concatenate([p.indices for p in parts])
        np.testing.assert_array_equal(np.sort(seen), np.sort(full.indices))

    def test_epoch_reshuffles_deterministically(self):
        s = ShardSampler(30, 0, 2, shuffle=True, seed=3)
        e0 = s.indices.copy()
        s.set_epoch(1)
        e1 = s.indices.copy()
        assert not np.array_equal(e0, e1)
        s.set_epoch(0)
        np.testing.assert_array_equal(s.indices, e0)

    def test_all_ranks_workers_cover_dataset(self):
        got = []
        for r in range(2):
            for w in range(2):
                got.extend(
                    ShardSampler(11, r, 2, worker=w, num_workers=2).indices.tolist()
                )
        assert set(got) == set(range(11))  # padded duplicates allowed


class TestPreload:
    def test_preload_matches_mmap(self, tmp_path):
        rng = np.random.default_rng(1)
        elems = [rng.integers(0, 255, (3, 5)).astype(np.uint8) for _ in range(4)]
        p = str(tmp_path / "x.torch.idx")
        write_torch_idx(p, elems)
        mm = TorchIdx(p)
        pre = TorchIdx(p).preload()
        for i in range(4):
            np.testing.assert_array_equal(mm[i], pre[i])
        np.testing.assert_array_equal(mm.as_array(), pre.as_array())

    def test_preload_shared_memory(self, tmp_path):
        elems = [np.arange(6, dtype=np.float32) + i for i in range(3)]
        p = str(tmp_path / "y.torch.idx")
        write_torch_idx(p, elems)
        pre = TorchIdx(p).preload(shared=True)
        try:
            for i in range(3):
                np.testing.assert_array_equal(pre[i], elems[i])
        finally:
            pre.close()

    def test_packed_dataset_preload(self, tmp_path):
        d = tmp_path / "rec" / "testing"
        d.mkdir(parents=True)
        write_torch_idx(
            str(d / "mono.torch.idx"),
            [np.full((2, 2), i, np.uint8) for i in range(3)],
        )
        write_torch_idx(str(d / "labels.torch.idx"), [{"i": i} for i in range(3)])
        ds = PackedDataset([str(d)], ["mono", "labels"], preload=True)
        assert ds[2]["labels"]["i"] == 2
        assert ds[2]["mono"][0, 0] == 2
