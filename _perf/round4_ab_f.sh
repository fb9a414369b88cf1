#!/bin/bash
# Round-4 TPU battery, phase F: batch resweep at the 530 balance +
# per-stage decomposition at serving defaults.
set -x
cd /root/repo

echo "=== F1. batch sweep at the post-BIASHOIST/U8EMB balance"
for b in 32 40 48; do
  timeout 3000 python bench.py --batch $b
done

echo "=== F2. per-stage decomposition (B=24, serving defaults)"
timeout 3000 python _perf/time_components.py --attn wm --batch 24 --parts stages,embed,shifts

echo "=== F3. control (B=24)"
timeout 3000 python bench.py
