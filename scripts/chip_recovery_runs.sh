#!/bin/bash
# Serial on-chip measurement queue (run after the axon tunnel recovers).
# NEVER run two TPU jobs concurrently (memory: axon-sandbox-gotchas).
set -x
cd /root/repo
BENCH_PARITY=0 timeout 900 python bench.py 2>/dev/null
timeout 1200 python scripts/profile_stages.py 2>&1 | grep --line-buffered -v WARNING
timeout 900 python examples/crowd.py --batch 32 --chunk 32 --frames 20 --size 256 2>&1 | grep -v WARNING | tail -3
RZ_TPU_TESTS=1 timeout 1500 python -m pytest tests/test_tpu_hw.py -m tpu -q 2>&1 | tail -4
BENCH_PARITY=0 BENCH_PHYSICS=0 timeout 900 python bench.py 2>/dev/null
echo ALL_DONE
