#!/bin/bash
# Round-5 phase B: decomposition INSIDE the wm kernel at product geometry
# (VERDICT round-4 next-#1).  Cumulative math-breaking probes; each
# stanza runs the per-stage scan so all four stages decompose in one
# battery.  Attribution by same-session diffs:
#   MLP        = B1 - B2
#   pv + epi   = B2 - B3
#   score+exp2 = B3 - B4
#   qkv + proj = B4 - B5
#   base (LN + grid + copies + residual) = B5
# B6/B7: the one candidate fix a positive "base" result names — stage-1-
# only G=8 (WMGMAX=8 at the default 512 KB slab only moves stage 1's
# group 4->8; stages 2-4 geometries are unchanged by the pick rule).
set -x
cd /root/repo
TC="python _perf/time_components.py --attn wm --batch 24 --parts stages"

echo "=== B1. control (round-5 defaults)"
timeout 4200 $TC
echo "=== B2. -MLP (LVT_NOMLPP)"
timeout 4200 env LVT_NOMLPP=1 $TC
echo "=== B3. -MLP -pv/epilogue (LVT_NOPV)"
timeout 4200 env LVT_NOMLPP=1 LVT_NOPV=1 $TC
echo "=== B4. -MLP -score/softmax/pv (LVT_NOSPV)"
timeout 4200 env LVT_NOMLPP=1 LVT_NOSPV=1 $TC
echo "=== B5. -MLP -all dots (LVT_NOQP)"
timeout 4200 env LVT_NOMLPP=1 LVT_NOQP=1 $TC
echo "=== B6. stage-1-only G=8 (LVT_WMGMAX=8, default slab)"
timeout 4200 env LVT_WMGMAX=8 $TC
echo "=== B7. full bench at WMGMAX=8"
timeout 4200 env LVT_WMGMAX=8 python bench.py
echo "=== B8. cross-encoder sub-block decomposition at the winning train defaults (ATTNLANES=1, SWINTRAIN=0)"
timeout 4200 python _perf/time_train.py --crossparts --fused-attn-train
echo "=== phase B done"
