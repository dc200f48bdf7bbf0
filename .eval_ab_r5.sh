#!/bin/bash
# Flagship A/B evals on CPU (n=200, fresh val seed 4242): heatmap decode
# (round-4 winner, fixed a priori) and the reference tlbr head.
set -e
cd /root/repo
ARGS="--depth 50 --d_model 256 --layers 4 --dec_layers 2 --hw 256 \
  --batch 16 --lr 3e-4 --milestones 9000 --device_data \
  --train_scale_min 1.0 --train_translate_frac 0.25 \
  --aux_match 0.5 --heatmap 1.0 --size_loss 0.5 --reweight 1.0 \
  --ckpt_dir .ckpt_ab_r5 --save_every 1000 --data_dir .data_ab_r5_eval"
E="env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE -u AXON_LOOPBACK_RELAY JAX_PLATFORMS=cpu"
$E python scripts/overlap_ab_demo.py $ARGS --steps 12000 \
  --val_pairs 200 --val_seed 4242 --box_source heatmap \
  > .ab_r5_flagship_heatmap.json
$E python scripts/overlap_ab_demo.py $ARGS --steps 12000 \
  --val_pairs 200 --val_seed 4242 --box_source tlbr \
  > .ab_r5_flagship_tlbr.json
echo FLAGSHIP_EVAL_DONE
