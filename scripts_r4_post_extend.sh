#!/bin/bash
# Round-4 POST-EXTENSION measurement queue (TPU-exclusive; launched only
# after scripts_r4_extend.sh prints its DONE marker):
#   M1. post-ball-query-rework roofline rows — the PERF.md round-4 roofline
#       predates the W=8192 scan kernel; local_sa1 (64 ms, the decisive row)
#       should now show the 4x op-level win end-to-end.
#   M2. bucketed-cascade dispatch-overhead diagnosis (tools/bucket_diag.py):
#       settles whether per-dispatch tunnel overhead is the 5.3-vs-9.4 binder.
#   M3. final trained+patch-selection headline bench (post-rework) — the
#       number BENCH_r04 should reproduce.
#   M4. bucketed bench at a wider fetch group (G=12) to anchor the diag.
# Every stage skip-if-done + archived/committed immediately.
set -x
cd /root/repo
PERF=data_synth2/perf_r4
mkdir -p $PERF
B=data_synth2/checkpoints_bench_r3
[ -d $B ] || { echo "bench ckpts missing"; exit 1; }

roofline_stage() {  # roofline_stage OUTNAME ARGS...
  local out=$PERF/$1; shift
  if [ -s "$out" ]; then return 0; fi
  timeout 2400 python -m cpfn_tpu.utils.roofline "$@" | tee "$out.part" \
    && mv "$out.part" "$out"
}
bench_stage() {  # bench_stage OUTNAME ENV...
  local out=$PERF/$1; shift
  if grep -q '"metric"' "$out" 2>/dev/null; then return 0; fi
  # 2400 s: the packed stages compile never-before-seen vmapped graphs
  # (cache misses pay the full remote compile + tunnel queue noise)
  timeout 2400 env "$@" python bench.py 2> "$out.err" | tee "$out"
  tail -4 "$out.err" >&2
}

# M1: post-rework roofline (same graph set as the round-4 table)
roofline_stage roofline_postbq_f32.json
bash scripts_archive_artifacts.sh "postextend roofline post-bq-rework"

# M2: bucketed dispatch diagnosis
if [ ! -s $PERF/bucket_diag.json ]; then
  timeout 2400 python tools/bucket_diag.py | tee $PERF/bucket_diag.json.part \
    && mv $PERF/bucket_diag.json.part $PERF/bucket_diag.json \
    || echo "BUCKET-DIAG FAILED (non-fatal)"
fi
bash scripts_archive_artifacts.sh "postextend bucket diag"

# M3: final headline bench (trained + patch selection, W=8192 default)
bench_stage bench_final_trained.json CPFN_BENCH_TRAINED=1 CPFN_BENCH_CKPT_DIR=$B
# M4: bucketed at G=12
bench_stage bench_bucketed_g12.json CPFN_BENCH_TRAINED=1 CPFN_BENCH_CKPT_DIR=$B \
  CPFN_BENCH_BUCKETED=1 CPFN_BENCH_BUCKET_GROUP=12
bash scripts_archive_artifacts.sh "postextend final benches"

# M5a: vmapped-Pallas hardware parity (the packed graphs vmap kernels the
# TPU has only ever run unbatched; interpret-mode parity is in the CPU
# suite, this pins the Mosaic lowering)
if [ ! -f $PERF/pallas_vmap_green ]; then
  timeout 1800 env CPFN_TEST_PLATFORM=axon python -m pytest \
    tests/test_pallas_tpu.py -q -k vmap 2>&1 | tee /tmp/pallas_vmap_r4.log | tail -3
  if grep -qE "^[0-9]+ passed" /tmp/pallas_vmap_r4.log \
     && ! grep -q failed /tmp/pallas_vmap_r4.log; then
    cp /tmp/pallas_vmap_r4.log $PERF/pallas_vmap_green
  fi
fi
bash scripts_archive_artifacts.sh "postextend pallas vmap parity"

# M5: PACKED serving path (group-vmapped phase1 + phase2; the round-4
# response to the bucketed regression — fewer dispatches AND less padded
# compute; parity pinned by tests/test_cascade_packed.py)
bench_stage bench_packed_g4w8.json CPFN_BENCH_TRAINED=1 CPFN_BENCH_CKPT_DIR=$B \
  CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=4 CPFN_BENCH_PACK_WIDTH=8
bench_stage bench_packed_g8w8.json CPFN_BENCH_TRAINED=1 CPFN_BENCH_CKPT_DIR=$B \
  CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=8 CPFN_BENCH_PACK_WIDTH=8
# oracle-mode packed (the driver's default bench mode — decides whether
# CPFN_BENCH_PACKED becomes the default before BENCH_r04 is recorded)
bench_stage bench_packed_oracle_g4w8.json \
  CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=4 CPFN_BENCH_PACK_WIDTH=8
bash scripts_archive_artifacts.sh "postextend packed benches"

echo "POST-EXTEND PIPELINE DONE"
