#!/bin/bash
# Round-3 GlobalSPFN retrain on the fixed LR schedule + full downstream
# re-derivation (VERDICT round-2 item 2). The round-2 global spent ~45k of
# its 60k steps with lr < 1e-6 (samples-vs-steps decay_step mistake); this
# retrains on the corrected 200k-sample staircase over the full 6144-cloud
# corpus, regenerates the test-split eval artifacts, and re-measures both
# sides of the cascade-vs-baseline comparison against the properly trained
# baseline. TPU jobs strictly serialized. Resumable (checkpoints_g2).
set -x
cd /root/repo

# 1) GlobalSPFN retrain, fixed schedule, 6144-cloud corpus
python -m cpfn_tpu.train.train_spfn \
  --config_file configs/config_synth2_global_v2.yml \
  --lowres_dataset data_synth2/lowres --csv_dir data_synth2/Dataset \
  --network GlobalSPFN --device_dataset \
  --max_steps 60000 --snapshot_steps 2000 --log_every 20 || exit 1

# 2) fresh test-split eval artifacts (object_seg/normals/type + features)
python -m cpfn_tpu.eval.eval_global \
  --config_file configs/config_synth2_global_v2.yml \
  --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
  --csv_dir data_synth2/Dataset --path_patches data_synth2/patches --scale 0.05 \
  --output_folder data_synth2/globalspfn_eval_g2 --evaluation_set test \
  --skip_features || exit 1

# 3) global-only baseline against the retrained model
python -m cpfn_tpu.eval.eval_baseline \
  --config_file configs/config_synth2_local_v8.yml \
  --highres_dataset data_synth2/highres --dir_spfn data_synth2/globalspfn_eval_g2 \
  --csv_dir data_synth2/Dataset --output_folder data_synth2/eval_out_g2 || exit 1

# 4) cascade with the v8 LocalSPFN on top of the retrained global
python -m cpfn_tpu.eval.eval_local \
  --config_file configs/config_synth2_local_v8.yml \
  --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
  --dir_spfn data_synth2/globalspfn_eval_g2 --dir_indices data_synth2/heatmaps \
  --csv_dir data_synth2/Dataset --output_folder data_synth2/eval_out_g2 \
  --scale 0.05 || exit 1

# 5) crossover table
python -m cpfn_tpu.eval.compare --output_folder data_synth2/eval_out_g2
