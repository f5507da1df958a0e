#!/bin/bash
# Round-4 CORPUS EXTENSION pipeline: grow the train split 6144 -> 10240
# clouds (deterministic per-cloud seeds; the 10,240 extension was generated
# in round 3 and wiped by host resets), rebuild lowres + patches for the new
# clouds, train LocalSPFN v10 (g2 warm start, v9 recipe) on the ~1.7x patch
# corpus, and land the 256-cloud v10-vs-g2 table. The g2 global model,
# patch-selection model, heatmaps, and baseline artifacts are unchanged —
# v10-vs-v9 isolates the data effect on the local side.
#
# Every stage is skip-if-done (own markers under _rebuild/ext_*) so the
# watchdog/recovery loop resumes after host resets. TPU stages serialized;
# evidence archived + committed per stage (scripts_archive_artifacts.sh).
set -x
cd /root/repo
mkdir -p _rebuild
D=data_synth2

# ---- E0: corpus extension (CPU, ~24 clouds/s measured)
if [ ! -f _rebuild/ext_corpus.done ]; then
  timeout 3600 python -m cpfn_tpu.data.gen_corpus --out $D \
    --n_train 10240 --n_test 256 || exit 1
  python -m cpfn_tpu.data.verify_corpus $D/highres --delete || exit 1
  n=$(ls $D/highres | wc -l)
  if [ "$n" -ne 10496 ]; then
    timeout 3600 python -m cpfn_tpu.data.gen_corpus --out $D \
      --n_train 10240 --n_test 256 || exit 1
  fi
  n=$(ls $D/highres | wc -l)
  [ "$n" -eq 10496 ] || { echo "ext corpus incomplete: $n/10496"; exit 1; }
  sync
  touch _rebuild/ext_corpus.done
fi

# ---- E1: lowres FPS subsample for the new clouds (TPU, skip_existing)
if [ ! -f _rebuild/ext_lowres.done ]; then
  timeout 7200 python -m cpfn_tpu.preprocess.lowres \
    --path_highres $D/highres --path_lowres $D/lowres \
    --path_split_file $D/Dataset/train_models.csv \
    --device --skip_existing || exit 1
  touch _rebuild/ext_lowres.done
  bash scripts_archive_artifacts.sh "ext lowres"
fi

# ---- E2: patch lane for the new clouds (CPU, niced, pidfile-guarded)
if [ ! -f _rebuild/ext_patches.done ]; then
  if ! { [ -f _rebuild/ext_patches.pid ] && kill -0 "$(cat _rebuild/ext_patches.pid)" 2>/dev/null; }; then
    nohup nice -n 10 bash -c "
      python -m cpfn_tpu.preprocess.patch_sampling \
        --path_highres $D/highres --path_lowres $D/lowres \
        --path_patches $D/patches --path_split_file $D/Dataset/train_models.csv \
        --scale 0.05 --skip_existing &&
      python -m cpfn_tpu.preprocess.patch_creation \
        --path_highres $D/highres --path_lowres $D/lowres \
        --path_patches $D/patches --path_split_file $D/Dataset/train_models.csv \
        --scale 0.05 --no_features --skip_existing &&
      touch _rebuild/ext_patches.done
    " >> _rebuild/ext_patches.log 2>&1 &
    echo $! > _rebuild/ext_patches.pid
  fi
  while [ ! -f _rebuild/ext_patches.done ]; do
    # liveness check + log heartbeat (the stall watchdog kills on a quiet
    # log; the patch lane is CPU-hours long). A dead lane exits nonzero so
    # the recovery relaunch respawns it.
    kill -0 "$(cat _rebuild/ext_patches.pid)" 2>/dev/null || exit 1
    echo "[E2] patch lane alive, $(ls $D/patches/0.05 2>/dev/null | wc -l) entries $(date -u +%H:%M:%S)"
    sleep 30
  done
fi

# ---- E3: LocalSPFN v10 (g2 warm start, v9 recipe, extended patch corpus)
if [ ! -d $D/checkpoints_v10/localspfn_0.05_final ]; then
  [ -d $D/warmstart/localspfn_from_g2 ] || exit 1
  timeout 28800 python -m cpfn_tpu.train.train_spfn \
    --config_file configs/config_synth2_local_v10.yml \
    --csv_dir $D/Dataset --path_patches $D/patches \
    --network LocalSPFN --scale 0.05 --device_dataset \
    --spfn_weights $D/warmstart/localspfn_from_g2 \
    --max_steps 60000 --snapshot_steps 2000 --log_every 20 || exit 1
  bash scripts_archive_artifacts.sh "ext v10 trained"
fi

# ---- E4: 256-cloud v10 cascade eval + compare vs the g2 baseline
if [ ! -f $D/eval_out_v10/Results.csv ]; then
  timeout 2400 python -m cpfn_tpu.eval.eval_local \
    --config_file configs/config_synth2_local_v10.yml \
    --lowres_dataset $D/lowres --highres_dataset $D/highres \
    --dir_spfn $D/globalspfn_eval_g2 --dir_indices $D/heatmaps \
    --csv_dir $D/Dataset --scale 0.05 \
    --weights $D/checkpoints_v10/localspfn_0.05 \
    --output_folder $D/eval_out_v10 || exit 1
fi
if [ ! -f $D/eval_out_v10/compare.txt ]; then
  cp $D/eval_out_g2/Results_baseline.csv \
     $D/eval_out_g2/Results_Stats_baseline.csv $D/eval_out_v10/ || exit 1
  timeout 600 python -m cpfn_tpu.eval.compare \
    --output_folder $D/eval_out_v10 | tee $D/eval_out_v10/compare.txt || exit 1
  bash scripts_archive_artifacts.sh "ext v10 256-cloud eval"
fi

echo "EXTENSION PIPELINE DONE"
