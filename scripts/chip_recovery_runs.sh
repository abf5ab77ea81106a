#!/bin/bash
# Serial on-chip measurement queue (run after the axon tunnel recovers).
# NEVER run two TPU jobs concurrently; anything that can hang Mosaic goes
# LAST (a killed TPU job can wedge the remote worker for hours —
# docs/DESIGN.md round-3 incident).
set -x
cd /root/repo
BENCH_PARITY=0 timeout 900 python bench.py 2>/dev/null
timeout 900 python examples/crowd.py --batch 32 --chunk 32 --frames 20 --size 256 2>&1 | grep -v WARNING | tail -3
BENCH_PARITY=0 BENCH_PHYSICS=0 timeout 900 python bench.py 2>/dev/null
timeout 1200 python scripts/profile_stages.py 2>&1 | grep --line-buffered -v WARNING
RZ_TPU_TESTS=1 timeout 1500 python -m pytest tests/test_tpu_hw.py -m tpu -q 2>&1 | tail -4
timeout 420 python scripts/mb_roww.py 2>&1 | grep -v WARNING | tail -8
# ---- hang-risk tail: mxu wedged the worker on 2026-08-17; analytic is
# untested on hardware. Run last, smallest first. ----
timeout 300 python /tmp/ana_kernel.py analytic 2>&1 | grep -v WARNING | tail -2
BENCH_PARITY=0 BENCH_MSAA_MODE=analytic timeout 600 python bench.py 2>/dev/null
echo ALL_DONE
