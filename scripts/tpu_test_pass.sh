#!/bin/bash
# On-hardware kernel test pass (VERDICT r3 item 8): runs the
# Mosaic-gated kernel tests on the REAL TPU (PNR_TPU_TEST_ON_TPU=1
# opts out of the CPU-mesh forcing in tests/conftest.py) and records
# the log as round evidence (TPU_TESTLOG_r<N>.txt, referenced from
# BASELINE.md). CPU CI cannot catch real-lowering bugs like the
# fused-Frangi ring-depth or the 2048-plane conv VMEM overflow — this
# pass exists so every round has a recorded hardware run.
#
# Usage: scripts/tpu_test_pass.sh [round-tag]   (e.g. r04)
set -u
TAG="${1:-r04}"
cd "$(dirname "$0")/.."
OUT="TPU_TESTLOG_${TAG}.txt"
{
  echo "# on-TPU kernel test pass ($TAG) — $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "# cmd: PNR_TPU_TEST_ON_TPU=1 pytest <kernel test files> -q"
  PNR_TPU_TEST_ON_TPU=1 PYTHONPATH=/root/.axon_site:/root/repo \
    timeout 3000 python -m pytest \
    tests/test_ops_dense.py tests/test_frangi_fused.py \
    tests/test_zncc.py tests/test_zncc_exact.py \
    -q -p no:cacheprovider 2>&1 | grep -v "WARNING"
  echo "exit: $?"
} | tee "$OUT"
