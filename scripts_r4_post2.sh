#!/bin/bash
# Round-4 POST-2 queue (TPU-exclusive; runs after scripts_r4_post_extend.sh
# prints POST-EXTEND PIPELINE DONE): validate + measure the FPS kernel
# rework (mask-sweep elimination, commit 09c264c), then re-record the rows
# it moves.
#   P1. full TPU Pallas parity suite (the rework changed all three FPS
#       kernel variants; interpret parity is in the CPU suite, this pins
#       the Mosaic lowering on hardware)
#   P2. tools/fps_time.py — op-level FPS parity + timing at bench shapes
#   P3. post-FPS roofline (local_sa1 is the row the rework attacks)
#   P4. post-FPS trained headline bench + packed-oracle bench (the two
#       BENCH_r04 candidates)
# Every stage skip-if-done + archived/committed immediately.
set -x
cd /root/repo
PERF=data_synth2/perf_r4
mkdir -p $PERF
B=data_synth2/checkpoints_bench_r3

bench_stage() {  # bench_stage OUTNAME ENV...
  local out=$PERF/$1; shift
  if grep -q '"metric"' "$out" 2>/dev/null; then return 0; fi
  timeout 2400 env "$@" python bench.py 2> "$out.err" | tee "$out"
  tail -4 "$out.err" >&2
}

# P1: TPU Pallas parity suite (all kernels, incl. the reworked FPS)
if [ ! -f $PERF/pallas_tpu_postfps_green ]; then
  timeout 2400 env CPFN_TEST_PLATFORM=axon python -m pytest \
    tests/test_pallas_tpu.py -q 2>&1 | tee /tmp/pallas_tpu_postfps.log | tail -3
  if grep -qE "^[0-9]+ passed" /tmp/pallas_tpu_postfps.log \
     && ! grep -q failed /tmp/pallas_tpu_postfps.log; then
    cp /tmp/pallas_tpu_postfps.log $PERF/pallas_tpu_postfps_green
  else
    echo "PALLAS TPU SUITE NOT GREEN — stopping before measurements"
    exit 1
  fi
fi
bash scripts_archive_artifacts.sh "post2 pallas tpu suite"

# P2: FPS op-level parity + timing
if [ ! -s $PERF/fps_time.json ]; then
  timeout 2400 python tools/fps_time.py | tee $PERF/fps_time.json.part \
    && mv $PERF/fps_time.json.part $PERF/fps_time.json
fi
bash scripts_archive_artifacts.sh "post2 fps timing"

# P3: post-FPS roofline
if [ ! -s $PERF/roofline_postfps_f32.json ]; then
  timeout 2400 python -m cpfn_tpu.utils.roofline \
    | tee $PERF/roofline_postfps_f32.json.part \
    && mv $PERF/roofline_postfps_f32.json.part $PERF/roofline_postfps_f32.json
fi
bash scripts_archive_artifacts.sh "post2 roofline post-fps"

# P4: post-FPS benches — the BENCH_r04 candidates
bench_stage bench_trained_postfps.json CPFN_BENCH_TRAINED=1 \
  CPFN_BENCH_CKPT_DIR=$B
bench_stage bench_packed_oracle_postfps.json \
  CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=4 CPFN_BENCH_PACK_WIDTH=8
bash scripts_archive_artifacts.sh "post2 benches post-fps"

# P5: packed trained re-runs after the custom_vmap + VMEM-limit fixes (the
# M5 g4w8 run predated them and g8w8 OOM'd in the flattened global FPS);
# w16 kills the overflow re-runs that w8 pays on >8-patch clouds
bench_stage bench_packed_g4w8_postfps.json CPFN_BENCH_TRAINED=1 \
  CPFN_BENCH_CKPT_DIR=$B \
  CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=4 CPFN_BENCH_PACK_WIDTH=8
bench_stage bench_packed_g8w8_postfps.json CPFN_BENCH_TRAINED=1 \
  CPFN_BENCH_CKPT_DIR=$B \
  CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=8 CPFN_BENCH_PACK_WIDTH=8
bench_stage bench_packed_g4w16_postfps.json CPFN_BENCH_TRAINED=1 \
  CPFN_BENCH_CKPT_DIR=$B \
  CPFN_BENCH_PACKED=1 CPFN_BENCH_PACK_GROUP=4 CPFN_BENCH_PACK_WIDTH=16
bash scripts_archive_artifacts.sh "post2 packed post-fix benches"

echo "POST2 PIPELINE DONE"
