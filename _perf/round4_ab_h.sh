#!/bin/bash
# Round-4 TPU battery, phase H: PEK retry (after the rank-3 bias-block
# lowering fix), the fixed NOEXP2 probe (square instead of exp2 — the
# multiply probe NaN'd through the PVSUM guard), and a closing control.
set -x
cd /root/repo

echo "=== H1. serving, LVT_PEK=1 (retry after lowering fix)"
timeout 3000 env LVT_PEK=1 python bench.py

echo "=== H2. probe: LVT_NOEXP2=1 (square instead of exp2)"
timeout 3000 env LVT_NOEXP2=1 python bench.py

echo "=== H3. control (final defaults, cache warm)"
timeout 3000 python bench.py
