#!/bin/bash
# Round-4 TPU battery, phase G: Pallas u8 patch-embed kernel A/B
# (LVT_PEK) + score-tile timing probes (NOEXP2/NOBIAS are parity-
# breaking probes — they bound what deleting the exp2 / bias-add passes
# could ever buy; they can never ship).
set -x
cd /root/repo

echo "=== G1. serving control (all defaults)"
timeout 3000 python bench.py

echo "=== G2. serving, LVT_PEK=1 (Pallas block-diag patch embed)"
timeout 3000 env LVT_PEK=1 python bench.py

echo "=== G3. probe: LVT_NOEXP2=1 (exp2 -> multiply)"
timeout 3000 env LVT_NOEXP2=1 python bench.py

echo "=== G4. probe: LVT_NOBIAS=1 (skip rel-pos bias add)"
timeout 3000 env LVT_NOBIAS=1 python bench.py

echo "=== G5. control repeat (drift)"
timeout 3000 python bench.py

echo "=== G6. wm group bump: LVT_WMSLAB=1M, GMAX=8 (stage3 G 2->4, stage1 4->8)"
timeout 3000 env LVT_WMSLAB=1048576 LVT_WMGMAX=8 python bench.py
