#!/bin/bash
# Round-5 CLEAN perf re-measure queue (TPU-exclusive; launched only after
# scripts_r5_pipeline.sh prints "R5 PIPELINE DONE" — every r5 bench so far
# ran concurrently with corpus gen / parallel pytest and the tunnel is
# host-CPU-sensitive: the same single-dispatch path measured 0.24 vs 8.56
# clouds/s purely from contention, ROUND5_NOTES ops lessons).
#
#   P1. bench_oracle_clean     — exact driver mode; the BENCH_r05 rehearsal
#   P2. packed oracle g4w8     — post host-side-stacking fix: decides
#                                whether packed becomes the default mode
#   P3. packed oracle g8w8/w16 — width/group sweep, oracle
#   P4. trained v11 single-dispatch + packed (fresh g2/patchselec/v11 ckpts)
#   P5. commit refreshed .xla_cache (driver warmup must be warm)
#   P6. trained-checkpoint reference-eval parity rerun (CPU)
#   P7. default pytest suite timing on the now-quiet box (CPU)
# Every stage skip-if-done; relaunch resumes.
set -x
cd /root/repo
D=data_synth2
PERF=$D/perf_r5
mkdir -p $PERF artifacts_r5

bench_stage() {  # bench_stage OUTNAME ENV...
  local out=$PERF/$1; shift
  if grep -q '"metric"' "$out" 2>/dev/null; then return 0; fi
  # 2400 s covers a full cold remote compile; bench.py itself emits a
  # warmup_exceeded JSON line at 1200 s instead of dying silent
  timeout 2400 env "$@" python bench.py 2> "$out.err" | tee "$out"
  tail -4 "$out.err" >&2
}

# ---- P0: assemble the trained-bench checkpoint dir from the r5 pipeline
B=$D/checkpoints_bench_r5
if [ ! -d $B ]; then
  if [ -d $D/checkpoints_g2/globalspfn_final ] \
     && [ -d $D/checkpoints/patchselec_0.05_final ] \
     && [ -d $D/checkpoints_v11/localspfn_0.05_final ]; then
    mkdir -p $B
    cp -r $D/checkpoints_g2/globalspfn_final        $B/globalspfn
    cp -r $D/checkpoints/patchselec_0.05_final      $B/patchselec_0.05
    cp -r $D/checkpoints_v11/localspfn_0.05_final   $B/localspfn_0.05
  else
    echo "trained ckpts incomplete; oracle stages only"
  fi
fi

# ---- P1: driver-mode bench, clean (this is what BENCH_r05 will run)
bench_stage bench_oracle_clean.json CPFN_BENCH_NOOP=0
bash scripts_archive_artifacts.sh "r5 clean oracle bench" || true

# ---- P2/P3: packed oracle sweep (post host-side group-stacking fix)
bench_stage bench_packed_oracle_g4w8.json \
  CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=4 CPFN_BENCH_PACK_WIDTH=8
bench_stage bench_packed_oracle_g8w8.json \
  CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=8 CPFN_BENCH_PACK_WIDTH=8
bench_stage bench_packed_oracle_g4w16.json \
  CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=4 CPFN_BENCH_PACK_WIDTH=16
bash scripts_archive_artifacts.sh "r5 packed oracle sweep" || true

# ---- P3b: fused-MLP + bf16 post-BQ-rework rows (VERDICT weak 4: both
# levers lost pre-rework; the graph shape changed enough to re-ask)
bench_stage bench_fused_oracle_postbq.json CPFN_BENCH_FUSED=1
bench_stage bench_bf16_oracle_postbq.json CPFN_BENCH_BF16=1
bash scripts_archive_artifacts.sh "r5 fused/bf16 post-BQ rows" || true

# ---- P3c: diagnostics for the round-5 optimization targets (exclusive TPU)
if [ ! -s $PERF/phase_ledger.json ]; then
  timeout 2400 python tools/phase_ledger.py 2> $PERF/phase_ledger.err \
    | tee $PERF/phase_ledger.json
  tail -3 $PERF/phase_ledger.err >&2
fi
if [ ! -s $PERF/fps_variants.json ]; then
  timeout 2400 python tools/fps_variants_time.py 2> $PERF/fps_variants.err \
    | tee $PERF/fps_variants.json
  tail -3 $PERF/fps_variants.err >&2
fi
bash scripts_archive_artifacts.sh "r5 phase ledger + fps variants" || true

# ---- P4: trained benches (v11 feature-injected local)
if [ -d $B ]; then
  bench_stage bench_trained_v11.json CPFN_BENCH_TRAINED=1 \
    CPFN_BENCH_CKPT_DIR=$B CPFN_BENCH_LOCAL_FEATURES=1
  bench_stage bench_packed_v11_g4w8.json CPFN_BENCH_TRAINED=1 \
    CPFN_BENCH_CKPT_DIR=$B CPFN_BENCH_LOCAL_FEATURES=1 \
    CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=4 CPFN_BENCH_PACK_WIDTH=8
fi
bash scripts_archive_artifacts.sh "r5 trained v11 benches" || true

# ---- P5: commit any refreshed XLA cache entries (driver warmup stays warm)
git add .xla_cache 2>/dev/null
git diff --cached --quiet || git commit -m "r5: refresh XLA cache after clean bench sweep" || true

# ---- P6: reference-eval parity with the TRAINED g2 checkpoint (CPU-only)
if [ -d $D/checkpoints_g2/globalspfn_final ] \
   && [ ! -s artifacts_r5/reference_parity_trained.json ]; then
  timeout 3600 env CPFN_PLATFORM=cpu JAX_PLATFORMS=cpu \
    python tools/reference_parity.py \
    --checkpoint $D/checkpoints_g2/globalspfn_final \
    --workdir data_parity_trained \
    --out_json artifacts_r5/reference_parity_trained.json \
    || echo "trained parity FAILED (non-fatal)"
fi
bash scripts_archive_artifacts.sh "r5 trained reference parity" || true

# ---- P7: default-suite timing on the quiet box (VERDICT item 8)
if [ ! -s $PERF/pytest_default_timing.txt ]; then
  { time timeout 1800 env JAX_PLATFORMS=cpu CPFN_PLATFORM=cpu \
      python -m pytest tests/ -m "not slow" -q ; } \
    > $PERF/pytest_default_timing.txt 2>&1 || true
  tail -5 $PERF/pytest_default_timing.txt
fi
bash scripts_archive_artifacts.sh "r5 default-suite timing" || true

echo "R5 PERF PIPELINE DONE"
