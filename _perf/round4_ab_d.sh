#!/bin/bash
# Round-4 phase D: serving experiments at the measured balance.
set -x
cd /root/repo

echo "=== D1. serving control"
timeout 3000 python bench.py --batch 24 --iters 50 --reps 3

echo "=== D2. NOCLAMP (drop the exp2 min pass, serving kernels)"
timeout 3000 env LVT_NOCLAMP=1 python bench.py --batch 24 --iters 50 --reps 3
