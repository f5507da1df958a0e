#!/bin/bash
# Reference-scale synthetic quality experiment (round 2, VERDICT item 3).
# TPU jobs are strictly serialized (one TPU process at a time on this host).
# Stage 1: GlobalSPFN 60k steps on the 2048-cloud lowres corpus.
# Stage 2: PatchSelection 20k steps (needs lowres+highres only).
# Resumable: each driver restores from its checkpoint dir on restart.
set -x
cd /root/repo

python -m cpfn_tpu.train.train_spfn \
  --config_file configs/config_synth2_global.yml \
  --lowres_dataset data_synth2/lowres --csv_dir data_synth2/Dataset \
  --network GlobalSPFN --device_dataset \
  --max_steps 60000 --snapshot_steps 2000 --log_every 20

python -m cpfn_tpu.train.train_patchselec \
  --config_file configs/config_synth2_patchselec.yml \
  --lowres_dataset data_synth2/lowres --highres_dataset data_synth2/highres \
  --csv_dir data_synth2/Dataset --scale 0.05 --max_steps 20000

# Stage 3: LocalSPFN on the GT-sampled patch corpus (feature-free).
python -m cpfn_tpu.train.train_spfn \
  --config_file configs/config_synth2_local.yml \
  --csv_dir data_synth2/Dataset --path_patches data_synth2/patches \
  --network LocalSPFN --scale 0.05 --device_dataset \
  --max_steps 40000 --snapshot_steps 2000 --log_every 20
