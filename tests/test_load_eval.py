"""load_eval aggregation tests against the golden reference fixture.

The bundled recording_00.npy holds the reference's own saved
tracked/gt/valid arrays -- aggregating it through our pipeline must
reproduce a direct NumPy evaluation of the reference formulas
(load_eval.py:26-89).
"""

import os
import pickle

import numpy as np

from absolutetrack_tpu.apps.load_eval import aggregate_metrics, compute_sequence_metrics

GOLDEN_NPY = "/root/reference/sample_data/user05/recording_00.npy"


def _golden():
    d = np.load(GOLDEN_NPY, allow_pickle=True)
    return d.tolist() if isinstance(d, np.ndarray) else d


class TestComputeSequenceMetrics:
    def test_against_direct_numpy(self):
        d = _golden()
        m = compute_sequence_metrics(
            d["gt_keypoints"], d["tracked_keypoints"], d["valid_tracking"]
        )
        gt, tr, valid = d["gt_keypoints"], d["tracked_keypoints"], d["valid_tracking"]
        err = np.linalg.norm(gt - tr, axis=-1).mean(-1)
        np.testing.assert_allclose(m["keypoint_errors"], err[valid], rtol=1e-6)

        acc = np.linalg.norm(
            tr[:, :-2] + tr[:, 2:] - 2 * tr[:, 1:-1], axis=-1
        ).mean(-1)
        acc_valid = valid[:, :-2] & valid[:, 1:-1] & valid[:, 2:]
        np.testing.assert_allclose(
            m["keypoint_accelerations"], acc[acc_valid], rtol=1e-6
        )
        assert m["n_valid"] == int(valid.sum())
        assert m["n_total"] == valid.size


class TestAggregateMetrics:
    def test_aggregation_over_golden_pickles(self, tmp_path):
        d = _golden()
        # two copies in nested dirs: aggregation must concatenate
        for sub in ("a", "b/nested"):
            p = tmp_path / sub
            p.mkdir(parents=True)
            with open(p / "rec.npy", "wb") as f:
                pickle.dump(d, f)
        m = aggregate_metrics(str(tmp_path))
        assert m["n_total"] == 2 * d["valid_tracking"].size
        # mean error equals the single-sequence mean (identical copies)
        gt, tr, valid = d["gt_keypoints"], d["tracked_keypoints"], d["valid_tracking"]
        want = np.linalg.norm(gt - tr, axis=-1).mean(-1)[valid].mean()
        np.testing.assert_allclose(m["mean_keypoint_error_mm"], want, rtol=1e-5)
        assert 0.0 <= m["pck_auc"] <= 1.0
        assert 0.0 < m["success_rate"] <= 1.0

    def test_empty_dir_returns_none(self, tmp_path):
        assert aggregate_metrics(str(tmp_path)) is None


class TestProfilingUtils:
    def test_stage_timers(self):
        import time

        from absolutetrack_tpu.utils.profiling import StageTimers

        t = StageTimers()
        with t.time("warp"):
            time.sleep(0.01)
        with t.time("warp"):
            time.sleep(0.01)
        with t.time("net"):
            time.sleep(0.005)
        s = t.summary()
        assert s["warp"]["count"] == 2
        assert s["warp"]["mean_ms"] >= 5
        assert "warp" in t.report() and "net" in t.report()

    def test_fps_counter(self):
        import time

        from absolutetrack_tpu.utils.profiling import FpsCounter

        c = FpsCounter()
        assert c.tick() == 0.0  # first tick has no interval
        time.sleep(0.01)
        assert c.tick() > 0.0
