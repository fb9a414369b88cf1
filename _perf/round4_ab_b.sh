#!/bin/bash
# Round-4 TPU battery, phase B: one clean same-session re-verification of
# every sub-noise-band serving default (VERDICT #6) + the current serving
# decomposition for the 479 -> 625 push (VERDICT #3).
set -x
cd /root/repo

echo "=== B1. serving control (all defaults, B=24)"
timeout 3000 python bench.py --batch 24 --iters 50 --reps 3

echo "=== B2. PVSUM off"
timeout 3000 env LVT_PVSUM=0 python bench.py --batch 24 --iters 50 --reps 3

echo "=== B3. EPI off"
timeout 3000 env LVT_EPI=0 python bench.py --batch 24 --iters 50 --reps 3

echo "=== B4. PSHIFT off"
timeout 3000 env LVT_PSHIFT=0 python bench.py --batch 24 --iters 50 --reps 3

echo "=== B5. PHASED on (round-3: 421.0 vs 416.6, inside noise — re-test)"
timeout 3000 env LVT_PHASED=1 python bench.py --batch 24 --iters 50 --reps 3

echo "=== B6. batch sweep at the new balance"
timeout 3000 python bench.py --batch 16 --iters 50 --reps 3
timeout 3000 python bench.py --batch 32 --iters 50 --reps 3
timeout 3000 python bench.py --batch 40 --iters 50 --reps 3

echo "=== B7. serving control repeat (drift check)"
timeout 3000 python bench.py --batch 24 --iters 50 --reps 3

echo "=== B8. stage/fusion decomposition"
timeout 3600 python _perf/time_components.py --attn wm --batch 24 \
    --parts stages,fusion,fusionparts,shifts,embed
