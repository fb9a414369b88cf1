#!/bin/bash
# Round-4 TPU battery, phase E: LVT_BF16S (bf16 score-tile chain) A/B
# with a fresh same-run control.
set -x
cd /root/repo

echo "=== E1. serving control (all defaults)"
timeout 3000 python bench.py

echo "=== E2. serving, LVT_BF16S=1 (bf16 score chain)"
timeout 3000 env LVT_BF16S=1 python bench.py

echo "=== E3. control repeat (drift)"
timeout 3000 python bench.py
