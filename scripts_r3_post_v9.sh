#!/bin/bash
# Round-3 post-v9 pipeline: everything queued on the TPU once the v9
# LocalSPFN (g2 warm start) finishes its 60k-step schedule.
#   1. 256-cloud cascade eval (v9) vs the g2 baseline  -> the headline table
#   2. shuffle-ensemble R=4 measurement (local side)
#   3. bf16 parity evals (local cascade + global)
#   4. oracle decomposition against the g2 baseline (capability ceiling)
#   5. trained / worst-case / bf16 production benches (VERDICT item 3+4)
#   6. roofline/MFU table for PERF.md (VERDICT item 7)
# TPU jobs strictly serialized; each stage is skipped if its artifact exists.
set -x
cd /root/repo

# Log heartbeat: the stall watchdog kills the process group when the log is
# quiet >600 s, but first-time XLA compiles of the big cascade graphs are
# silent for longer than that (r3 measured a 1193 s warmup). Every stage in
# this pipeline is individually bounded by `timeout`, so hang recovery does
# not depend on the stall kill here — keep the log warm for its duration.
( while :; do echo "[post-v9 heartbeat] $(date -u +%H:%M:%S)"; sleep 120; done ) &
HB_PID=$!
trap 'kill $HB_PID 2>/dev/null' EXIT

V9=data_synth2/checkpoints_v9/localspfn_0.05
COMMON_LOCAL="--config_file configs/config_synth2_local_v9.yml \
  --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
  --dir_spfn data_synth2/globalspfn_eval_g2 --dir_indices data_synth2/heatmaps \
  --csv_dir data_synth2/Dataset --scale 0.05 --weights $V9"

# 1) full 256-cloud cascade with v9; baseline CSVs reused from eval_out_g2
#    (the baseline is v9-independent: same global artifacts, same eval path)
if [ ! -f data_synth2/eval_out_v9/Results.csv ]; then
  timeout 2400 python -m cpfn_tpu.eval.eval_local $COMMON_LOCAL \
    --output_folder data_synth2/eval_out_v9 || exit 1
fi
cp data_synth2/eval_out_g2/Results_baseline.csv \
   data_synth2/eval_out_g2/Results_Stats_baseline.csv data_synth2/eval_out_v9/
python -m cpfn_tpu.eval.compare --output_folder data_synth2/eval_out_v9 \
  | tee data_synth2/eval_out_v9/compare.txt
bash scripts_archive_artifacts.sh "stage1 headline v9 vs g2"

# 2) ensemble R=4, local side (64 clouds: gain measurement, not the headline)
if [ ! -f data_synth2/eval_out_v9ens/Results.csv ]; then
  timeout 2400 python -m cpfn_tpu.eval.eval_local $COMMON_LOCAL --first_n 64 \
    --n_shuffles 4 --output_folder data_synth2/eval_out_v9ens \
    || echo "STAGE2-ENSEMBLE FAILED (non-fatal)"
fi
if [ -f data_synth2/eval_out_v9ens/Results.csv ]; then
  timeout 2400 python -m cpfn_tpu.eval.eval_baseline \
    --config_file configs/config_synth2_local_v9.yml \
    --highres_dataset data_synth2/highres \
    --dir_spfn data_synth2/globalspfn_eval_g2 --csv_dir data_synth2/Dataset \
    --output_folder data_synth2/eval_out_v9ens --first_n 64 \
    && python -m cpfn_tpu.eval.compare --output_folder data_synth2/eval_out_v9ens \
    || echo "STAGE2-COMPARE FAILED (non-fatal)"
fi
bash scripts_archive_artifacts.sh "stage2 ensemble R=4"

# 3a) bf16 cascade parity (64 clouds vs the f32 numbers from stage 1)
if [ ! -f data_synth2/eval_out_v9bf16/Results.csv ]; then
  timeout 2400 python -m cpfn_tpu.eval.eval_local $COMMON_LOCAL --first_n 64 \
    --bf16 --output_folder data_synth2/eval_out_v9bf16 \
    || echo "STAGE3A-BF16 FAILED (non-fatal)"
fi
# 3b) bf16 global parity (64 clouds, fresh f32-vs-bf16 pair)
if [ ! -f data_synth2/globalspfn_eval_bf16/Results.csv ]; then
  timeout 2400 python -m cpfn_tpu.eval.eval_global \
    --config_file configs/config_synth2_global_v2.yml \
    --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
    --csv_dir data_synth2/Dataset --path_patches data_synth2/patches \
    --scale 0.05 --output_folder data_synth2/globalspfn_eval_bf16 \
    --evaluation_set test --skip_features --first_n 64 --bf16 \
    || echo "STAGE3B-BF16 FAILED (non-fatal)"
fi
bash scripts_archive_artifacts.sh "stage3 bf16 parity"

# 4) oracle ceiling vs the g2 baseline (skip once recorded)
if ! grep -q "oracle-cascade" data_synth2/eval_out_v9/oracle_g2.txt 2>/dev/null; then
  timeout 2400 python tools/diag_oracle.py 64 data_synth2/globalspfn_eval_g2 \
    | tee data_synth2/eval_out_v9/oracle_g2.txt || echo "oracle stage timed out"
fi
bash scripts_archive_artifacts.sh "stage4 oracle ceiling vs g2"

# 4b) Mosaic-lowering validation of all Pallas kernels (incl. the new fused
#     eval MLP chains) on hardware, before any fused measurements
if [ ! -f data_synth2/perf_r3/pallas_tpu_green ]; then
  timeout 1800 env CPFN_TEST_PLATFORM=axon python -m pytest tests/test_pallas_tpu.py -q \
    2>&1 | tee /tmp/pallas_tpu_r3.log | tail -3
  if grep -qE "^[0-9]+ passed" /tmp/pallas_tpu_r3.log && ! grep -q failed /tmp/pallas_tpu_r3.log; then
    mkdir -p data_synth2/perf_r3
    cp /tmp/pallas_tpu_r3.log data_synth2/perf_r3/pallas_tpu_green
  fi
fi

# 5) production benches (refresh the bench checkpoint dir first).
#    Results persist under data_synth2/perf_r3/ and each is skipped on a
#    watchdog relaunch once its JSON is non-empty (a killed run leaves an
#    empty/partial tee file, which re-runs).
PERF=data_synth2/perf_r3
mkdir -p $PERF
if [ ! -d data_synth2/checkpoints_bench_r3 ]; then
  mkdir -p data_synth2/checkpoints_bench_r3
  cp -r data_synth2/checkpoints_g2/globalspfn_final \
        data_synth2/checkpoints_bench_r3/globalspfn
  cp -r data_synth2/checkpoints/patchselec_0.05 \
        data_synth2/checkpoints_bench_r3/patchselec_0.05
  cp -r $V9 data_synth2/checkpoints_bench_r3/localspfn_0.05
fi
B=data_synth2/checkpoints_bench_r3
bench_stage() {  # bench_stage OUTNAME ENV...
  local out=$PERF/$1; shift
  if grep -q '"metric"' "$out" 2>/dev/null; then return 0; fi
  timeout 1800 env "$@" python bench.py 2> "$out.err" | tee "$out"
  tail -4 "$out.err" >&2
}
bench_stage bench_trained.json CPFN_BENCH_TRAINED=1 CPFN_BENCH_CKPT_DIR=$B
bench_stage bench_worst.json CPFN_BENCH_TRAINED=1 CPFN_BENCH_CKPT_DIR=$B CPFN_BENCH_WORST=1
bench_stage bench_bf16.json CPFN_BENCH_TRAINED=1 CPFN_BENCH_CKPT_DIR=$B CPFN_BENCH_BF16=1
bench_stage bench_oracle.json CPFN_DUMMY=0
# cold-start experiment (VERDICT item 6): identical fresh process right
# after — if the persistent compilation cache works on this runtime, run 2's
# warmup should collapse; if not, the warmup floor is remote-compile time
bench_stage bench_shuffles.json CPFN_BENCH_TRAINED=1 CPFN_BENCH_CKPT_DIR=$B CPFN_BENCH_SHUFFLES=4
bench_stage bench_oracle2.json CPFN_DUMMY=0
grep -h "warmup done" $PERF/bench_oracle.json.err $PERF/bench_oracle2.json.err
# cold-start per-graph compile breakdown (VERDICT r3 item 5)
if [ ! -s $PERF/warmup_breakdown.json ]; then
  timeout 2400 python tools/warmup_breakdown.py | tee $PERF/warmup_breakdown.json.part \
    && mv $PERF/warmup_breakdown.json.part $PERF/warmup_breakdown.json \
    || echo "WARMUP-BREAKDOWN FAILED (non-fatal)"
fi
bash scripts_archive_artifacts.sh "stage5 production benches"

# 6) roofline table (f32 + bf16 + fused variants of the local forward)
roofline_stage() {  # roofline_stage OUTNAME ARGS...
  local out=$PERF/$1; shift
  if [ -s "$out" ]; then return 0; fi
  timeout 2400 python -m cpfn_tpu.utils.roofline "$@" | tee "$out.part" \
    && mv "$out.part" "$out"
}
roofline_stage roofline_f32.json
roofline_stage roofline_bf16.json --bf16
roofline_stage roofline_fused.json --graphs local_fwd --fused
roofline_stage roofline_fused_bf16.json --graphs local_fwd --fused --bf16
bash scripts_archive_artifacts.sh "stage6 roofline MFU"

# 7) fused-kernel bench (only meaningful if 4b passed — inspect before use)
bench_stage bench_fused.json CPFN_BENCH_TRAINED=1 CPFN_BENCH_CKPT_DIR=$B CPFN_BENCH_FUSED=1
bash scripts_archive_artifacts.sh "stage7 fused bench"

# 8) ensemble-vs-ensemble (64 clouds): R=4 on BOTH sides — global artifacts
#    regenerated with the shuffle ensemble, then baseline + cascade on them
if [ ! -f data_synth2/globalspfn_eval_g2ens/Results.csv ]; then
  timeout 2400 python -m cpfn_tpu.eval.eval_global \
    --config_file configs/config_synth2_global_v2.yml \
    --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
    --csv_dir data_synth2/Dataset --path_patches data_synth2/patches \
    --scale 0.05 --output_folder data_synth2/globalspfn_eval_g2ens \
    --evaluation_set test --skip_features --first_n 64 --n_shuffles 4 \
    || echo "STAGE8-GLOBALENS FAILED (non-fatal)"
fi
if [ -f data_synth2/globalspfn_eval_g2ens/Results.csv ]; then
  timeout 2400 python -m cpfn_tpu.eval.eval_baseline \
    --config_file configs/config_synth2_local_v9.yml \
    --highres_dataset data_synth2/highres \
    --dir_spfn data_synth2/globalspfn_eval_g2ens --csv_dir data_synth2/Dataset \
    --output_folder data_synth2/eval_out_bothens --first_n 64 \
    && timeout 2400 python -m cpfn_tpu.eval.eval_local --config_file configs/config_synth2_local_v9.yml \
      --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
      --dir_spfn data_synth2/globalspfn_eval_g2ens --dir_indices data_synth2/heatmaps \
      --csv_dir data_synth2/Dataset --scale 0.05 --weights $V9 --first_n 64 \
      --n_shuffles 4 --output_folder data_synth2/eval_out_bothens \
    && python -m cpfn_tpu.eval.compare --output_folder data_synth2/eval_out_bothens \
    || echo "STAGE8 FAILED (non-fatal)"
fi
bash scripts_archive_artifacts.sh "stage8 ensemble both sides"

# 9) OVERNIGHT: LocalSPFN extension 60k->90k (probe said the model was still
#    LR-schedule-limited at 60k), then the 256-cloud cascade on the extended
#    model. Resumes in a copied dir so v9@60k survives max_to_keep pruning.
if [ ! -d data_synth2/checkpoints_v9e90 ]; then
  cp -r data_synth2/checkpoints_v9 data_synth2/checkpoints_v9e90
fi
timeout 14400 python -m cpfn_tpu.train.train_spfn \
  --config_file configs/config_synth2_local_v9e90.yml \
  --csv_dir data_synth2/Dataset --path_patches data_synth2/patches \
  --network LocalSPFN --scale 0.05 --device_dataset \
  --max_steps 90000 --snapshot_steps 2000 --log_every 20 || exit 1
if [ ! -f data_synth2/eval_out_v9e90/Results.csv ]; then
  timeout 2400 python -m cpfn_tpu.eval.eval_local \
    --config_file configs/config_synth2_local_v9e90.yml \
    --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
    --dir_spfn data_synth2/globalspfn_eval_g2 --dir_indices data_synth2/heatmaps \
    --csv_dir data_synth2/Dataset --scale 0.05 \
    --weights data_synth2/checkpoints_v9e90/localspfn_0.05 \
    --output_folder data_synth2/eval_out_v9e90 || exit 1
fi
cp data_synth2/eval_out_g2/Results_baseline.csv \
   data_synth2/eval_out_g2/Results_Stats_baseline.csv data_synth2/eval_out_v9e90/
python -m cpfn_tpu.eval.compare --output_folder data_synth2/eval_out_v9e90 \
  | tee data_synth2/eval_out_v9e90/compare.txt
bash scripts_archive_artifacts.sh
echo "POST-V9 PIPELINE DONE"

# 10) bucketed two-phase cascade bench (round-4 design work; parity already
#     pinned by tests/test_cascade_buckets.py). If it beats the 9.02
#     single-dispatch trained row, CPFN_BENCH_BUCKETED becomes the default.
bench_stage bench_bucketed.json CPFN_BENCH_TRAINED=1 CPFN_BENCH_CKPT_DIR=$B CPFN_BENCH_BUCKETED=1
bash scripts_archive_artifacts.sh "stage10 bucketed bench"

# 11) ball-query chunk-width sweep on the bench shapes (the measured 48 ms
#     bottleneck inside local_sa1) — picks the CPFN_BQ_CHUNK default.
if [ ! -s $PERF/bq_sweep.json ]; then
  timeout 2400 python tools/bq_sweep.py | tee $PERF/bq_sweep.json.part \
    && mv $PERF/bq_sweep.json.part $PERF/bq_sweep.json \
    || echo "BQ-SWEEP FAILED (non-fatal)"
fi
bash scripts_archive_artifacts.sh "stage11 bq sweep"
