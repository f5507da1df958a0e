#!/bin/bash
# Round-5 quality pipeline: rebuild the corpus-derived state (host reset
# wiped data_synth2/ again) and train the FEATURE-INJECTED LocalSPFN v11 —
# the VERDICT-r4 quality lever (glob/loc features are wired in the
# reference, pn2_network.py:22-27, but never trained there or here).
#
#   S1  lowres FPS subsample (TPU, device path), both splits
#   S2  patch-index sampling, train split (CPU lane, runs under S3)
#   S3  GlobalSPFN g2 60k steps (TPU) — same recipe/steps as rounds 3/4 so
#       the committed r4 baselines stay comparable
#   S4a test-split eval artifacts for the baseline eval (TPU)
#   S4b train-split FEATURE extraction (TPU, features_only: one forward per
#       train cloud, [P,128]+[1024] per cloud to host)
#   S2b patch h5 creation WITH features (CPU; needs S2 + S4b)
#   S5  PatchSelection 15k steps (TPU)
#   S6  test-split heatmaps (TPU)
#   S7  g2 global-only baseline eval on the 256-cloud test split (TPU)
#   S8  v11 warm start from g2 (zero-init feature rows)
#   S9  LocalSPFN v11 50k steps (TPU)
#   S10 256-cloud cascade eval v11 + compare vs the g2 baseline (TPU)
#
# Every stage is skip-if-done; relaunch resumes. Run under
# scripts_run_with_watchdog.sh (stall 900s) + per-stage hard timeouts
# (ROUND4 ops lesson: bare eval CLIs with no timeout hung 7+ min).
set -x
cd /root/repo
D=data_synth2
mkdir -p _rebuild $D

[ -f _rebuild/corpus.done ] || { echo "corpus not ready"; exit 1; }

# ---- S1: lowres (TPU)
if [ ! -f _rebuild/lowres.done ]; then
  for split in train test; do
    timeout 7200 python -m cpfn_tpu.preprocess.lowres \
      --path_highres $D/highres --path_lowres $D/lowres \
      --path_split_file $D/Dataset/${split}_models.csv \
      --device --skip_existing || exit 1
  done
  touch _rebuild/lowres.done
fi

# ---- S2: patch-index sampling (CPU lane, pidfile-guarded)
if [ ! -f _rebuild/psample.done ]; then
  if ! { [ -f _rebuild/psample.pid ] && kill -0 "$(cat _rebuild/psample.pid)" 2>/dev/null; }; then
    nohup nice -n 10 bash -c "
      python -m cpfn_tpu.preprocess.patch_sampling \
        --path_highres $D/highres --path_lowres $D/lowres \
        --path_patches $D/patches --path_split_file $D/Dataset/train_models.csv \
        --scale 0.05 --skip_existing &&
      touch _rebuild/psample.done
    " >> _rebuild/psample.log 2>&1 &
    echo $! > _rebuild/psample.pid
  fi
fi

# ---- S3: GlobalSPFN g2, 60k steps (TPU)
if [ ! -d $D/checkpoints_g2/globalspfn_final ]; then
  timeout 21600 python -m cpfn_tpu.train.train_spfn \
    --config_file configs/config_synth2_global_v2.yml \
    --lowres_dataset $D/lowres --csv_dir $D/Dataset \
    --network GlobalSPFN --device_dataset \
    --max_steps 60000 --snapshot_steps 2000 --log_every 20 || exit 1
fi

# ---- S4a: test-split eval artifacts (object_seg/normals/type) for baseline
if [ ! -f $D/globalspfn_eval_g2/Results.csv ]; then
  timeout 7200 python -m cpfn_tpu.eval.eval_global \
    --config_file configs/config_synth2_global_v2.yml \
    --lowres_dataset $D/lowres --highres_dataset $D/highres \
    --csv_dir $D/Dataset --path_patches $D/patches --scale 0.05 \
    --output_folder $D/globalspfn_eval_g2 --evaluation_set test --resume || exit 1
  # (features NOT skipped: v11's eval needs global_feat + local_feat_full)
fi
bash scripts_archive_artifacts.sh "r5 g2 test eval" || true

# ---- S4b: train-split feature extraction (needs S2's _indices.npy)
while [ ! -f _rebuild/psample.done ]; do
  kill -0 "$(cat _rebuild/psample.pid)" 2>/dev/null || exit 1
  sleep 30
done
if [ ! -f _rebuild/feats.done ]; then
  timeout 14400 python -m cpfn_tpu.eval.eval_global \
    --config_file configs/config_synth2_global_v2.yml \
    --lowres_dataset $D/lowres --highres_dataset $D/highres \
    --csv_dir $D/Dataset --path_patches $D/patches --scale 0.05 \
    --output_folder $D/globalspfn_feats --evaluation_set train \
    --features_only --skip_existing || exit 1
  touch _rebuild/feats.done
fi

# ---- S2b: per-patch h5 creation WITH features (CPU lane)
if [ ! -f _rebuild/pcreate.done ]; then
  if ! { [ -f _rebuild/pcreate.pid ] && kill -0 "$(cat _rebuild/pcreate.pid)" 2>/dev/null; }; then
    nohup nice -n 10 bash -c "
      python -m cpfn_tpu.preprocess.patch_creation \
        --path_highres $D/highres --path_lowres $D/lowres \
        --path_patches $D/patches --path_split_file $D/Dataset/train_models.csv \
        --path_features $D/globalspfn_feats \
        --scale 0.05 --skip_existing &&
      touch _rebuild/pcreate.done
    " >> _rebuild/pcreate.log 2>&1 &
    echo $! > _rebuild/pcreate.pid
  fi
fi

# ---- S5: PatchSelection 15k steps (TPU)
if [ ! -f _rebuild/patchselec.done ]; then
  timeout 10800 python -m cpfn_tpu.train.train_patchselec \
    --config_file configs/config_synth2_patchselec.yml \
    --lowres_dataset $D/lowres --highres_dataset $D/highres \
    --csv_dir $D/Dataset --scale 0.05 --max_steps 15000 || exit 1
  touch _rebuild/patchselec.done
fi

# ---- S6: test-split heatmaps (predicted patch pools for the cascade eval)
if [ ! -f _rebuild/heatmaps.done ]; then
  timeout 7200 python -m cpfn_tpu.eval.eval_patchselec \
    --config_file configs/config_synth2_patchselec.yml \
    --lowres_dataset $D/lowres --highres_dataset $D/highres \
    --heatmap_folder $D/heatmaps --csv_dir $D/Dataset --scale 0.05 || exit 1
  touch _rebuild/heatmaps.done
fi

# ---- S7: g2 global-only baseline on the 256-cloud test split
if [ ! -f $D/eval_out_v11/Results_baseline.csv ]; then
  timeout 7200 python -m cpfn_tpu.eval.eval_baseline \
    --config_file configs/config_synth2_local_v11.yml \
    --highres_dataset $D/highres --dir_spfn $D/globalspfn_eval_g2 \
    --csv_dir $D/Dataset --output_folder $D/eval_out_v11 --resume || exit 1
fi
bash scripts_archive_artifacts.sh "r5 baseline eval" || true

# ---- S8: v11 warm start (CPU; needs the patch lane for nothing, g2 only)
while [ ! -f _rebuild/pcreate.done ]; do
  kill -0 "$(cat _rebuild/pcreate.pid)" 2>/dev/null || exit 1
  sleep 30
done
if [ ! -d $D/warmstart/localspfn_v11 ]; then
  python -m cpfn_tpu.train.make_warmstart \
    --global_config configs/config_synth2_global_v2.yml \
    --local_config configs/config_synth2_local_v11.yml \
    --global_weights $D/checkpoints_g2/globalspfn_final \
    --out $D/warmstart/localspfn_v11 || exit 1
fi

# ---- S9: LocalSPFN v11 (feature-injected), 50k steps (TPU)
if [ ! -d $D/checkpoints_v11/localspfn_0.05_final ]; then
  timeout 21600 python -m cpfn_tpu.train.train_spfn \
    --config_file configs/config_synth2_local_v11.yml \
    --csv_dir $D/Dataset --path_patches $D/patches \
    --network LocalSPFN --scale 0.05 --device_dataset \
    --spfn_weights $D/warmstart/localspfn_v11 \
    --max_steps 50000 --snapshot_steps 2000 --log_every 20 || exit 1
fi

# ---- S10: 256-cloud cascade eval (v11) + compare vs baseline
if [ ! -f $D/eval_out_v11/Results.csv ]; then
  timeout 10800 python -m cpfn_tpu.eval.eval_local \
    --config_file configs/config_synth2_local_v11.yml \
    --highres_dataset $D/highres --lowres_dataset $D/lowres \
    --dir_spfn $D/globalspfn_eval_g2 --dir_indices $D/heatmaps \
    --csv_dir $D/Dataset --scale 0.05 \
    --output_folder $D/eval_out_v11 --resume || exit 1
fi
if [ ! -f $D/eval_out_v11/compare.txt ]; then
  timeout 1200 python -m cpfn_tpu.eval.compare \
    --output_folder $D/eval_out_v11 \
    > $D/eval_out_v11/compare.txt || echo "compare failed (non-fatal)"
fi
bash scripts_archive_artifacts.sh "r5 v11 cascade eval" || true
echo "R5 PIPELINE DONE"
