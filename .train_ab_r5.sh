#!/bin/bash
# Round-5 flagship OETR training (VERDICT r4 #2): ResNet50/d=256/4L —
# the shipped config (config.oetr_r50_config shapes) — with the round-4
# winning recipe. Train segments on the TPU; the final n=200 evals run
# with JAX_PLATFORMS=cpu so the chip is free for the next training job.
set -e
cd /root/repo
ARGS="--depth 50 --d_model 256 --layers 4 --dec_layers 2 --hw 256 \
  --batch 16 --lr 3e-4 --milestones 9000 --device_data \
  --train_scale_min 1.0 --train_translate_frac 0.25 \
  --aux_match 0.5 --heatmap 1.0 --size_loss 0.5 --reweight 1.0 \
  --ckpt_dir .ckpt_ab_r5 --save_every 1000 --data_dir .data_ab_r5"
for SEG in 2000 4000 6000 8000 10000 12000; do
  python scripts/overlap_ab_demo.py $ARGS --steps $SEG --skip_eval \
    --val_pairs 8 --val_seed 4242
done
echo FLAGSHIP_TRAIN_DONE
