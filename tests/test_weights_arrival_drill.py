"""Weights-arrival-day drill (round-5 verdict item 8).

The real ``pretrained_weights.torch`` is absent from this mount
(reference .MISSING_LARGE_BLOBS). This drill proves first contact with it
cannot fail on naming/shape plumbing: it fabricates a FULL-SIZE torch
state dict with the reference's exact key names/shapes (the torch twin
from test_weight_parity, mirroring lib/models/model_loader.py:53-88),
saves it as a .torch FILE, and runs BOTH eval apps plus load_eval from
that file through the real app surface -- the torch-pickle sniffing,
converter, full-size model build, tracking and metrics aggregation all
execute on the exact path the real checkpoint will take.

test_weight_parity covers module-level conversion numerics; this covers
the file -> app chain.
"""

import os
import shutil

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_torch_file_drives_both_eval_apps(tmp_path):
    from test_weight_parity import _build_torch_tree

    from absolutetrack_tpu.apps import (
        load_eval,
        run_eval_known_skeleton,
        run_eval_unknown_skeleton,
    )

    ckpt = str(tmp_path / "pretrained_weights.torch")
    with open(ckpt, "wb") as f:
        torch.save(_build_torch_tree().state_dict(), f)

    # one recording, two frames: plumbing drill, not an accuracy run
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    shutil.copy(
        "/root/reference/sample_data/user05/recording_00.json",
        os.path.join(data_dir, "recording_00.json"),
    )

    known_dir = str(tmp_path / "known")
    run_eval_known_skeleton.main([
        "--input-dir", data_dir, "--output-dir", known_dir,
        "--checkpoint", ckpt, "--max-frames", "2", "--override",
    ])
    unknown_dir = str(tmp_path / "unknown")
    run_eval_unknown_skeleton.main([
        "--input-dir", data_dir, "--output-dir", unknown_dir,
        "--checkpoint", ckpt, "--max-frames", "2", "--override",
    ])

    mk = load_eval.aggregate_metrics(known_dir)
    mu = load_eval.aggregate_metrics(unknown_dir)
    # plumbing asserts only: the fabricated weights are random, so error
    # magnitudes are meaningless -- what matters is that every frame came
    # out finite and accounted for through the full-size (96x96) model
    assert mk["n_total"] == 2 * 2  # 1 recording x 2 frames x 2 hands
    assert mu["n_total"] == 2 * 2
    assert np.isfinite(mk["mean_keypoint_error_mm"])
    assert np.isfinite(mu["mean_keypoint_error_mm"])
