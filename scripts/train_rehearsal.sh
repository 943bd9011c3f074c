#!/bin/bash
# Trained-weights dress rehearsal (the checkpoint recipe).
#
# Trains BOTH regressor branches on windows produced by the REAL
# crop/warp pipeline over synthetic-renderer frames posed by the
# sample_data labels (training/rendered.py), at the serving crop size.
# recording_11 is held out; the run prints held-out tracked MPJPE.
#
# Stage 1 builds the window caches on CPU (no TPU grant held).
# Stage 2 trains on the TPU through the single-client lock.
#
# Afterwards: benchmarks/rehearsal_bench.py and the eval protocol chain
# (run_eval_known_skeleton / run_eval_unknown_skeleton / load_eval with
# --checkpoint tmp/checkpoints/rehearsal.msgpack) consume the result.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

STEPS=${STEPS:-600}
BATCH=${BATCH:-16}
LR=${LR:-3e-4}
CKPT=${CKPT:-tmp/checkpoints/rehearsal.msgpack}

python -u - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
from absolutetrack_tpu.models import ModelConfig
from absolutetrack_tpu.training.rendered import rendered_dataset

cfg = ModelConfig()  # (96, 96) serving crop size
root = "/root/reference/sample_data/user05"
rendered_dataset(
    [f"{root}/recording_00.json", f"{root}/recording_02.json"],
    window_t=8, stride=4, cfg=cfg,
    cache_path="tmp/rendered_ds_96_T8_s4_train.npz",
)
rendered_dataset(
    [f"{root}/recording_11.json"],
    window_t=8, stride=4, cfg=cfg, max_windows_per_recording=64,
    cache_path="tmp/rendered_ds_96_T8_s4_held.npz",
)
print("caches ready")
EOF

exec scripts/tpu_run.sh 5400 python -u -m absolutetrack_tpu.apps.train \
    --rendered --input-size 96 --window 8 --rendered-stride 4 \
    --branch both --steps "$STEPS" --batch "$BATCH" --lr "$LR" \
    --eval-every 50 --save-every 100 --save "$CKPT"
