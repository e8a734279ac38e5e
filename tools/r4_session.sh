#!/bin/bash
# Round-4 hardware measurement session — run top to bottom when the
# axon tunnel is healthy; artifacts land in /tmp/r4/. Order matters:
# default-flip evidence (steps 1-4) before the at-spec records
# (steps 6-7), so the suite reflects final defaults.
set -x
mkdir -p /tmp/r4
cd /root/repo

# 0. health
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. [done 2026-08-21] DMA x MT-shade combos on PBRTest/VeachMIS/Glass
#    -> PBR: dma +31%, mt 2.4x SLOWER (field-wise resolve gathers);
#       Veach: dma tie, mt 3x slower (same cause, untextured form).
#    DMA default flipped ON (use_dma_stream).

# 2. resolve-stage A/B: field-wise vs row-gather at megabatch
PYTHONUNBUFFERED=1 timeout 1800 python tools/probe_resolve.py \
  2>&1 | tee /tmp/r4/resolve.log

# 3. re-run the PBR combo with the row-gather resolve (now default) —
#    the MT-shade default decision
PYTHONUNBUFFERED=1 timeout 3000 python tools/probe_mt_combo.py \
  --scene PBRTest --spp 16 --reps 3 --combos 0:0,0:1 \
  2>&1 | tee /tmp/r4/mt_combo_pbr_row.log

# 4. DarkCornell fine-tile repack under the DMA kernels (the headline
#    scene's first per-ray-work lever; verdict r3 item 2)
PYTHONUNBUFFERED=1 timeout 3600 python tools/probe_multitile.py \
  --scene DarkCornell --spp 40 --reps 3 \
  --combos 512:0:0,128:0:1,64:0:1,32:0:1 \
  2>&1 | tee /tmp/r4/cornell_tt.log

# 5. headline bench after the default flips — cold then warm regime
#    (verdict r3 item 5: capture BOTH)
PYTHONUNBUFFERED=1 timeout 3000 python bench.py 2>&1 | tee /tmp/r4/bench1.log
PYTHONUNBUFFERED=1 timeout 1800 python bench.py 2>&1 | tee /tmp/r4/bench2.log

# 6. quality gate, both halves, on hardware -> QUALITY_r4
PYTHONUNBUFFERED=1 timeout 3600 python tools/quality_gate.py \
  2>&1 | tee /tmp/r4/quality.log

# 7. BASELINE configs at spec (no --scale) -> SUITE_r4.json
PYTHONUNBUFFERED=1 timeout 28800 python tools/bench_suite.py --scale 1 \
  --out /tmp/r4/SUITE_r4.json 2>&1 | tee /tmp/r4/suite.log

# 7b. GlassTest with the state-sorted driver + compaction schedules
#     (verdict r3 item 7: the long-specular-chain workload on hardware;
#     combos are dma:mt — dma now defaults on, so 1:0 is the default
#     config and 0:0 the DMA ablation)
RUSTIC_SORT_MODE=state PYTHONUNBUFFERED=1 timeout 2400 \
  python tools/probe_mt_combo.py --scene GlassTest --spp 16 --reps 3 \
  --combos 1:0,0:0 2>&1 | tee /tmp/r4/glass_state.log

# 8. shade-kernel block-size sweep + fold-8 (verdict r3 item 8)
PYTHONUNBUFFERED=1 timeout 2400 python tools/probe_shade_bs.py \
  2>&1 | tee /tmp/r4/shade_bs.log
RUSTIC_SAMPLE_FOLD=8 PYTHONUNBUFFERED=1 timeout 2400 python bench.py \
  2>&1 | tee /tmp/r4/bench_fold8.log
