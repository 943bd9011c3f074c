#!/bin/bash
# Serialize TPU jobs: the axon tunnel grants the chip to one process at a
# time; concurrent clients fail registration ("Backend 'axon' is not in the
# list of known backends"). Usage: scripts/tpu_run.sh <timeout_s> <cmd...>
set -u
T="$1"; shift
exec flock /tmp/at_tpu.lock timeout "$T" "$@"
