#!/bin/bash
# Round-4 TPU battery, phase I: PEK A/B (kernel v2 — host-side kh row
# split, block-diag dots; Mosaic-lowering-verified locally) + the
# bounded NOEXP2 probe + closing control (cache warm at final code).
set -x
cd /root/repo

echo "=== I1. serving, LVT_PEK=1 (Pallas u8 patch embed v2)"
timeout 3000 env LVT_PEK=1 python bench.py

echo "=== I2. probe: LVT_NOEXP2=1 (min(|s|,115) instead of exp2)"
timeout 3000 env LVT_NOEXP2=1 python bench.py

echo "=== I3. control (final defaults)"
timeout 3000 python bench.py
