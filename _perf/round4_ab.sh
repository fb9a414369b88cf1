#!/bin/bash
# Round-4 TPU battery, phase A: the COREBWD train A/B (VERDICT #2) +
# on-device gradient parity (ADVICE #2), same session = same-run controls.
set -x
cd /root/repo

echo "=== A1. train control: LVT_COREBWD=0 (round-3 29.96 config)"
timeout 3000 env LVT_COREBWD=0 python bench.py --train --iters 10 --reps 3

echo "=== A2. train: LVT_COREBWD=1 (flash core backward)"
timeout 3000 env LVT_COREBWD=1 python bench.py --train --iters 10 --reps 3

echo "=== A3. COREBWD on-device gradient parity (stage-3 geometry)"
timeout 3000 python _perf/corebwd_parity.py

echo "=== A4. train control repeat (drift check)"
timeout 3000 env LVT_COREBWD=0 python bench.py --train --iters 10 --reps 3
