#!/bin/bash
# Round-4 TPU measurement block: run AFTER the rehearsal checkpoint is
# trained. One tpu_run.sh client per step (the lock serializes); steps
# ordered so a failure late in the list doesn't cost the early numbers.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
CKPT=${CKPT:-tmp/checkpoints/rehearsal.msgpack}
log() { echo "=== $1 $(date +%H:%M:%S) ==="; }

log "warp kernel sweep (int8 rows)"
scripts/tpu_run.sh 2400 python -u benchmarks/warp_kernel_sweep.py \
    > tmp/m_warp_sweep.log 2>&1
tail -12 tmp/m_warp_sweep.log

log "eval chain: known-skeleton (full length, batched)"
scripts/tpu_run.sh 3000 python -u -m absolutetrack_tpu.apps.run_eval_known_skeleton \
    --output-dir tmp/m_eval_known --checkpoint "$CKPT" --override \
    --batch-recordings 4 > tmp/m_eval_known.log 2>&1
tail -8 tmp/m_eval_known.log

log "eval chain: unknown-skeleton x 3 calib modes"
for mode in mean lstsq gn; do
  scripts/tpu_run.sh 2400 python -u -m absolutetrack_tpu.apps.run_eval_unknown_skeleton \
      --output-dir tmp/m_eval_unknown_$mode --checkpoint "$CKPT" --override \
      --calib-mode $mode --max-frames 96 > tmp/m_eval_unknown_$mode.log 2>&1
  echo "--- $mode ---"; grep -E "calibrated scale|mean keypoint|Final" tmp/m_eval_unknown_$mode.log | tail -10
done

log "load_eval aggregation"
python - > tmp/m_load_eval.log 2>&1 <<'PYEOF'
from absolutetrack_tpu.apps import load_eval
for tag, d in [("known", "tmp/m_eval_known"),
               ("unknown(mean)", "tmp/m_eval_unknown_mean"),
               ("unknown(lstsq)", "tmp/m_eval_unknown_lstsq"),
               ("unknown(gn)", "tmp/m_eval_unknown_gn")]:
    print(tag, load_eval.aggregate_metrics(d))
PYEOF
cat tmp/m_load_eval.log

log "rehearsal live-loop bench (trained)"
scripts/tpu_run.sh 2400 python -u benchmarks/rehearsal_bench.py \
    --checkpoint "$CKPT" > tmp/m_rehearsal_bench.log 2>&1
tail -4 tmp/m_rehearsal_bench.log

log "demo surface rehearsal (trained)"
scripts/tpu_run.sh 2400 python -u benchmarks/demo_rehearsal.py \
    --checkpoint "$CKPT" > tmp/m_demo_rehearsal.log 2>&1
tail -4 tmp/m_demo_rehearsal.log

log "ALL DONE"
