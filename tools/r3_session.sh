#!/bin/bash
# Round-3 hardware measurement session — run top to bottom when the
# axon tunnel is healthy. Each step is resumable; artifacts land in
# /tmp/r3/. Order matters: default-flip evidence (steps 1-2) before the
# at-spec records (steps 4-5), so the suite reflects final defaults.
set -x
mkdir -p /tmp/r3
cd /root/repo

# 0. health
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. e2e multi-tile combos: DMA stream x kernel-shade-MT on PBRTest
PYTHONUNBUFFERED=1 timeout 3000 python tools/probe_mt_combo.py \
  --scene PBRTest --spp 16 --reps 2 --combos 0:0,1:0,0:1,1:1 \
  2>&1 | tee /tmp/r3/mt_combo_pbr.log

# 2. same on VeachMIS (6 tiles) + GlassTest (glass path)
PYTHONUNBUFFERED=1 timeout 2400 python tools/probe_mt_combo.py \
  --scene VeachMIS --spp 16 --reps 2 --combos 0:0,1:0,1:1 \
  2>&1 | tee /tmp/r3/mt_combo_veach.log
PYTHONUNBUFFERED=1 timeout 2400 python tools/probe_mt_combo.py \
  --scene GlassTest --spp 16 --reps 2 --combos 0:0,1:0,1:1 \
  2>&1 | tee /tmp/r3/mt_combo_glass.log

# 3. headline bench (fresh line after any default flip)
PYTHONUNBUFFERED=1 timeout 3000 python bench.py 2>&1 | tee /tmp/r3/bench.log

# 4. quality gate, both halves, on hardware
PYTHONUNBUFFERED=1 timeout 3600 python tools/quality_gate.py \
  2>&1 | tee /tmp/r3/quality.log

# 5. BASELINE configs at spec (no --scale)
PYTHONUNBUFFERED=1 timeout 14400 python tools/bench_suite.py \
  2>&1 | tee /tmp/r3/suite.log
