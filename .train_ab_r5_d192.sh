#!/bin/bash
# d=192 A/B row refresh at n=200: resume the committed round-4 mid-run
# state (.ckpt_ab_r4, latest step 5000) to 12k with the round-4 recipe,
# then eval on the SAME fresh val (seed 4242, n=200) as the flagship.
set -e
cd /root/repo
ARGS="--depth 18 --d_model 192 --layers 4 --dec_layers 2 --hw 256 \
  --batch 16 --lr 3e-4 --milestones 9000 --device_data \
  --train_scale_min 1.0 --train_translate_frac 0.25 \
  --aux_match 0.5 --heatmap 1.0 --size_loss 0.5 --reweight 1.0 \
  --ckpt_dir .ckpt_ab_r4 --save_every 1000 --data_dir .data_ab_r5"
for SEG in 7000 9000 11000 12000; do
  python scripts/overlap_ab_demo.py $ARGS --steps $SEG --skip_eval \
    --val_pairs 8 --val_seed 4242
done
E="env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE -u AXON_LOOPBACK_RELAY JAX_PLATFORMS=cpu"
$E python scripts/overlap_ab_demo.py $ARGS --steps 12000 \
  --val_pairs 200 --val_seed 4242 --box_source heatmap \
  > .ab_r5_d192_heatmap.json
echo D192_DONE
