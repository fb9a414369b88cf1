#!/bin/bash
# Round-5 TPU battery, phase A: the three new defaults get same-session
# A/Bs (round-4 measurement discipline — every default flip needs a
# same-run control):
#   LVT_WMQKV     slab-level qkv+proj hoist in the wm kernel (serving,
#                 stage-1/2 lever)
#   LVT_ATTNLANES lanes-layout BERT train attention kernel (train lever)
#   LVT_SWINTRAIN plain-AD train composition for the Swin blocks (train
#                 backward lever)
# All kernel files changed this round, so every stanza is a fresh relay
# compile; the script ends on plain `python bench.py` so the driver's
# BENCH run hits a warm cache.
set -x
cd /root/repo

echo "=== A1. serving control (all round-5 defaults: WMQKV=1)"
timeout 4200 python bench.py

echo "=== A2. serving, LVT_WMQKV=0 (round-4 per-window qkv/proj)"
timeout 4200 env LVT_WMQKV=0 python bench.py

echo "=== A2b. serving, LVT_EMBING=1 (window-major u8 embed ingress)"
timeout 4200 env LVT_EMBING=1 python bench.py

echo "=== A2c. per-stage scan timings at the new defaults (stage-1 focus)"
timeout 4200 python _perf/time_components.py --attn wm --batch 24 \
    --parts stages,embed

echo "=== A3. train control (ATTNLANES=1 SWINTRAIN=1, round-5 defaults)"
timeout 4200 python bench.py --train --fused-attn-train

echo "=== A4. train, LVT_ATTNLANES=0 (heads-layout train kernel)"
timeout 4200 env LVT_ATTNLANES=0 python bench.py --train --fused-attn-train

echo "=== A5. train, LVT_SWINTRAIN=0 (fused custom_vjp Swin backward)"
timeout 4200 env LVT_SWINTRAIN=0 python bench.py --train --fused-attn-train

echo "=== A6. train, both OFF (round-4 configuration reproduction)"
timeout 4200 env LVT_ATTNLANES=0 LVT_SWINTRAIN=0 python bench.py --train \
    --fused-attn-train

echo "=== A7. serving control repeat (drift check, warm cache for driver)"
timeout 4200 python bench.py
