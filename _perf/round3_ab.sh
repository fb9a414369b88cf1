#!/bin/bash
# Round-3 TPU A/B battery — run once the relay is back.
# Each stanza prints one JSON/console line; ~2h total with cold compiles.
set -x
cd /root/repo

echo "=== 1. serving sanity (wm default, cached compile expected)"
timeout 2400 python bench.py --batch 24 --iters 30 --reps 2

echo "=== 2. serving: phased kernel A/B"
timeout 2400 env LVT_PHASED=1 python bench.py --batch 24 --iters 30 --reps 2

echo "=== 3. train baseline (drop-path lerp path, B=8)"
timeout 2400 python bench.py --train --iters 10 --reps 2

echo "=== 4. train + fused attention train kernel"
timeout 2400 python bench.py --train --iters 10 --reps 2 --fused-attn-train

echo "=== 5. train + fused FFN train kernel"
timeout 2400 python bench.py --train --iters 10 --reps 2 --fused-ffn-train

echo "=== 6. train + both"
timeout 2400 python bench.py --train --iters 10 --reps 2 \
    --fused-attn-train --fused-ffn-train

echo "=== 7. train-step decomposition"
timeout 3600 python _perf/time_train.py --batch 8 --iters 10
