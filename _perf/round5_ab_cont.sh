#!/bin/bash
# Round-5 battery continuation: the train stanzas (A3-A6) — the previous
# run was cut before A3 completed.  Same methodology: min-of-3 reps,
# same-session controls.
set -x
cd /root/repo

echo "=== A3. train control (ATTNLANES=1 SWINTRAIN=1, round-5 defaults)"
timeout 4200 python bench.py --train --fused-attn-train

echo "=== A4. train, LVT_ATTNLANES=0 (heads-layout train kernel)"
timeout 4200 env LVT_ATTNLANES=0 python bench.py --train --fused-attn-train

echo "=== A5. train, LVT_SWINTRAIN=0 (fused custom_vjp Swin backward)"
timeout 4200 env LVT_SWINTRAIN=0 python bench.py --train --fused-attn-train

echo "=== A6. train, both OFF (round-4 configuration reproduction)"
timeout 4200 env LVT_ATTNLANES=0 LVT_SWINTRAIN=0 python bench.py --train \
    --fused-attn-train

echo "=== A6b. train decomposition at the winning defaults"
timeout 4200 python _perf/time_train.py --fused-attn-train \
    --parts step,swin,fusion,opt

echo "=== battery continuation done"
