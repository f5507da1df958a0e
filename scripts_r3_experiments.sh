#!/bin/bash
# Round-3 stage A+B experiments, run AFTER scripts_synth2_global_v2.sh:
#   A. probe-p1 checkpoint under the fixed eval (the round-2 "no transfer"
#      verdict was measured with the broken sorted-order eval)
#   B. shuffle-ensemble (R=4) gain measurement, local side and global side
# All on the 64-cloud test subset against the round-2 global artifacts
# (globalspfn_eval_fix) so the numbers are directly comparable to the
# v8 cascade 0.4287 / baseline 0.4050 row in QUALITY.md. TPU serialized.
set -x
cd /root/repo

COMMON_LOCAL="--config_file configs/config_synth2_local_v8.yml \
  --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
  --dir_indices data_synth2/heatmaps --csv_dir data_synth2/Dataset \
  --scale 0.05 --first_n 64"

# A) p1 probe (v8@60k + 3k frozen-BN fine-tune at fresh LR), fixed eval
python -m cpfn_tpu.eval.eval_local $COMMON_LOCAL \
  --dir_spfn data_synth2/globalspfn_eval_fix \
  --output_folder data_synth2/eval_out_p1fix \
  --weights data_synth2/checkpoints_p1/localspfn_0.05 || exit 1

# B1) local-side ensemble R=4 on the v8 model
python -m cpfn_tpu.eval.eval_local $COMMON_LOCAL \
  --dir_spfn data_synth2/globalspfn_eval_fix \
  --output_folder data_synth2/eval_out_ens4 \
  --n_shuffles 4 || exit 1

# B2) global-side ensemble R=4: fresh global artifacts ...
python -m cpfn_tpu.eval.eval_global \
  --config_file configs/config_synth2_global.yml \
  --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
  --csv_dir data_synth2/Dataset --path_patches data_synth2/patches --scale 0.05 \
  --output_folder data_synth2/globalspfn_eval_ens4 --evaluation_set test \
  --skip_features --first_n 64 --n_shuffles 4 || exit 1

# ... then the baseline on them ...
python -m cpfn_tpu.eval.eval_baseline \
  --config_file configs/config_synth2_local_v8.yml \
  --highres_dataset data_synth2/highres \
  --dir_spfn data_synth2/globalspfn_eval_ens4 \
  --csv_dir data_synth2/Dataset \
  --output_folder data_synth2/eval_out_gens4 --first_n 64 || exit 1

# ... and the cascade with BOTH sides ensembled (v8 local, R=4)
python -m cpfn_tpu.eval.eval_local $COMMON_LOCAL \
  --dir_spfn data_synth2/globalspfn_eval_ens4 \
  --output_folder data_synth2/eval_out_gens4 \
  --n_shuffles 4 || exit 1
