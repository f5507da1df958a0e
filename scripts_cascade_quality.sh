#!/bin/bash
# Synthetic high-res cascade quality experiment (round-1 validation):
# trained GlobalSPFN -> eval artifacts on 100k-pt clouds -> GT patch h5s ->
# LocalSPFN training -> cascaded eval vs global-only baseline.
set -x
cd /root/repo
# 1) GlobalSPFN eval artifacts on the high-res clouds (both splits)
python -m cpfn_tpu.eval.eval_global --config_file configs/config_synth_train.yml \
  --lowres_dataset data_synth/hr_lowres --highres_dataset data_synth/highres \
  --csv_dir data_synth/DatasetHR --path_patches data_synth/hr_patches --scale 0.05 \
  --output_folder data_synth/hr_globalspfn --evaluation_set test --skip_features
# 2) per-patch training h5s (feature-free)
python -m cpfn_tpu.preprocess.patch_creation --path_highres data_synth/highres \
  --path_lowres data_synth/hr_lowres --path_patches data_synth/hr_patches \
  --path_split_file data_synth/DatasetHR/train_models.csv --scale 0.05 --no_features
python -m cpfn_tpu.preprocess.patch_creation --path_highres data_synth/highres \
  --path_lowres data_synth/hr_lowres --path_patches data_synth/hr_patches \
  --path_split_file data_synth/DatasetHR/test_models.csv --scale 0.05 --no_features
