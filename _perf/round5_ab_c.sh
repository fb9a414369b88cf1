#!/bin/bash
# Round-5 phase C: final serving default flips.
#   C1: control at the flipped WMGMAX=8 source default (this is also the
#       driver-warm compile of the shipping bench program if ENCG loses)
#   C2: LVT_ENCG=2 — G-batched grid in the serving fusion-attention
#       kernel (same session A/B vs C1)
set -x
cd /root/repo

echo "=== C1. serving control (source defaults: WMGMAX=8 cap)"
timeout 4200 python bench.py

echo "=== C2. serving, LVT_ENCG=2"
timeout 4200 env LVT_ENCG=2 python bench.py

echo "=== phase C done"
