#!/bin/bash
# Cascade-vs-baseline quality evaluation at reference-like data scale
# (round 2, VERDICT item 3). Run AFTER scripts_synth2_train.sh and the
# LocalSPFN stage have finished. TPU jobs serialized.
set -x
cd /root/repo

# 1) GlobalSPFN eval artifacts on the test split (object_seg/normals/type)
python -m cpfn_tpu.eval.eval_global \
  --config_file configs/config_synth2_global.yml \
  --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
  --csv_dir data_synth2/Dataset --path_patches data_synth2/patches --scale 0.05 \
  --output_folder data_synth2/globalspfn_eval --evaluation_set test --skip_features

# 2) heatmap patch indices from the trained PatchSelection network
python -m cpfn_tpu.eval.eval_patchselec \
  --config_file configs/config_synth2_patchselec.yml \
  --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
  --csv_dir data_synth2/Dataset --heatmap_folder data_synth2/heatmaps --scale 0.05

# 3) global-only baseline (evaluation_baselineSPFN path)
python -m cpfn_tpu.eval.eval_baseline \
  --config_file configs/config_synth2_local.yml \
  --highres_dataset data_synth2/highres --dir_spfn data_synth2/globalspfn_eval \
  --csv_dir data_synth2/Dataset --output_folder data_synth2/eval_out

# 4) cascaded LocalSPFN + cross-scale fusion (evaluation_localSPFN path)
# v8 config: its checkpoint_dir points at checkpoints_v8 (the current best
# LocalSPFN run); the plain config would silently evaluate the stale model.
python -m cpfn_tpu.eval.eval_local \
  --config_file configs/config_synth2_local_v8.yml \
  --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
  --dir_spfn data_synth2/globalspfn_eval --dir_indices data_synth2/heatmaps \
  --csv_dir data_synth2/Dataset --output_folder data_synth2/eval_out --scale 0.05
