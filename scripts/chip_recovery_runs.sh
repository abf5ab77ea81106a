#!/bin/bash
# Serial on-chip measurement queue (run after the axon tunnel recovers).
# NEVER run two TPU jobs concurrently, NEVER kill an attached process
# (SIGKILL/timeout expiry wedges the tunnel 5-10+ min — docs/DESIGN.md
# round-5 "kill cascade"); bench.py has its own in-process watchdog.
set -x
cd /root/repo
python bench.py                                     # official capture (G=32)
python scripts/profile_stages.py 2>&1 | grep --line-buffered -v WARNING
python examples/crowd.py --batch 32 --chunk 32 --frames 20 --size 256 \
    2>&1 | grep -v WARNING | tail -3
RZ_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -m tpu -q 2>&1 | tail -4
echo ALL_DONE
