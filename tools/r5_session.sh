#!/bin/bash
# Round-5 hardware measurement session. Run top to bottom with a healthy
# axon tunnel; artifacts land in /tmp/r5/ and the committable records in
# the repo root. Measurement FIRST (the at-spec records are 3 rounds
# overdue), probes and perf work after.
set -x
mkdir -p /tmp/r5
cd /root/repo

# 0. health
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. quality gate -> QUALITY_r5.json (committable)
PYTHONUNBUFFERED=1 timeout 5400 python tools/quality_gate.py \
  --out /root/repo/QUALITY_r5.json 2>&1 | tee /tmp/r5/quality.log

# 1b. VeachMIS RMSE attribution: if the default plan fails the 1e-3
#     gate, re-run the case with the f32 dot to pin the divergence on
#     the precision plan (vs an integrator bug).
RUSTIC_FLASH_DOT=f32 PYTHONUNBUFFERED=1 timeout 3600 \
  python tools/quality_gate.py --skip-furnace --cases veachmis \
  2>&1 | tee /tmp/r5/quality_veach_f32.log

# 2. BASELINE configs at spec (no --scale) -> SUITE_r5.json (committable)
PYTHONUNBUFFERED=1 timeout 28800 python tools/bench_suite.py --scale 1 \
  --out /root/repo/SUITE_r5.json 2>&1 | tee /tmp/r5/suite.log

# 3. at-spec ground-truth films (BVH oracle) + extended RMSE gate
#    (full gate again so the committed artifact keeps the furnace
#    matrix alongside the at-spec RMSE rows)
PYTHONUNBUFFERED=1 timeout 14400 python tools/make_reference_films.py \
  2>&1 | tee /tmp/r5/make_films.log
PYTHONUNBUFFERED=1 timeout 10800 python tools/quality_gate.py \
  --out /root/repo/QUALITY_r5.json \
  2>&1 | tee /tmp/r5/quality_atspec.log

# 4. resolve-stage A/B (died silently in r4 — rerun, watch for OOM/hang)
PYTHONUNBUFFERED=1 timeout 1800 python tools/probe_resolve.py \
  --b 921600 2>&1 | tee /tmp/r5/resolve_1m.log
PYTHONUNBUFFERED=1 timeout 1800 python tools/probe_resolve.py \
  2>&1 | tee /tmp/r5/resolve.log

# 5. MT-shade decision: PBRTest/VeachMIS with row-gather resolve default
PYTHONUNBUFFERED=1 timeout 3000 python tools/probe_mt_combo.py \
  --scene PBRTest --spp 16 --reps 3 --combos 1:0,1:1 \
  2>&1 | tee /tmp/r5/mt_combo_pbr_row.log
PYTHONUNBUFFERED=1 timeout 3000 python tools/probe_mt_combo.py \
  --scene VeachMIS --spp 16 --reps 3 --combos 1:0,1:1 \
  2>&1 | tee /tmp/r5/mt_combo_veach_row.log

# 6. DarkCornell fine-tile repack under DMA (headline per-ray-work lever)
PYTHONUNBUFFERED=1 timeout 3600 python tools/probe_multitile.py \
  --scene DarkCornell --spp 40 --reps 3 \
  --combos 512:0:1,128:0:1,64:0:1,32:0:1 \
  2>&1 | tee /tmp/r5/cornell_tt.log

# 7. GlassTest state-sorted driver (long specular chains)
RUSTIC_SORT_MODE=state PYTHONUNBUFFERED=1 timeout 2400 \
  python tools/probe_mt_combo.py --scene GlassTest --spp 16 --reps 3 \
  --combos 1:0,0:0 2>&1 | tee /tmp/r5/glass_state.log

# 8. shade block-size sweep + fold-8
PYTHONUNBUFFERED=1 timeout 2400 python tools/probe_shade_bs.py \
  2>&1 | tee /tmp/r5/shade_bs.log
RUSTIC_SAMPLE_FOLD=8 PYTHONUNBUFFERED=1 timeout 2400 python bench.py \
  2>&1 | tee /tmp/r5/bench_fold8.log

# 9. headline bench (honest regimes; median-of-3 inside)
PYTHONUNBUFFERED=1 timeout 3000 python bench.py 2>&1 | tee /tmp/r5/bench1.log

# 10. interactive loop on hardware: headless viewer stepping ~30s
PYTHONUNBUFFERED=1 timeout 1800 python tools/probe_viewer_rate.py \
  2>&1 | tee /tmp/r5/viewer_rate.log
