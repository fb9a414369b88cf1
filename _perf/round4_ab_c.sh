#!/bin/bash
# Round-4 phase C: post-COREBWD train decomposition (where do the
# remaining train ms sit now that the flash core backward is measured ON).
set -x
cd /root/repo
timeout 3600 python _perf/time_train.py --batch 8 --iters 10

echo "=== C2. fused_ffn_train re-test at the new COREBWD balance"
timeout 3000 python bench.py --train --iters 10 --reps 3 --fused-ffn-train

echo "=== C3. train batch sweep (B x B product grows quadratically)"
timeout 3000 python bench.py --train --train-batch 12 --iters 10 --reps 3
