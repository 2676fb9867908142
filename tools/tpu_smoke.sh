#!/bin/bash
# TPU kernel smoke: health-gated, <=2 min once caches are warm.
#
# Round-4 VERDICT weak item 4: a Mosaic/worker regression in the fused
# kernels used to surface only when a round-end bench chain crashed
# (chain_r27 died on a NameError in pallas_vcycle.py that no CPU test
# reaches). Every TPU chain script must run this FIRST, after the health
# gate, so a fused-kernel regression fails in minutes instead of hours.
#
# Usage: bash tools/tpu_smoke.sh   (exit 0 = kernels healthy)
set -u
cd "$(dirname "$0")/.."
timeout 1800 python tools/probes/tpu_health.py || exit 2
PFHUB_TPU_TESTS=1 timeout 1200 python -m pytest tests/test_tpu_kernels.py -x -q \
  -k "fused_vcycle or split_chain" || exit 1
echo "tpu_smoke: OK"
