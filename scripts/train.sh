#!/bin/bash
# Mesh-sharded OETR training (parity: reference scripts/train.sh which used
# torch.distributed.launch over 2 GPUs; here the mesh spans all local chips).
python -m oetr_tpu.training.cli \
    --base_path "${MEGADEPTH_PATH:?set MEGADEPTH_PATH}" \
    --train_pairs "${TRAIN_PAIRS:?set TRAIN_PAIRS}" \
    --val_pairs "${VAL_PAIRS:-}" \
    --batch_size "${BATCH_SIZE:-8}" --epochs "${EPOCHS:-35}" \
    --pairs_per_epoch "${PAIRS_PER_EPOCH:-128000}" \
    --save_path "${SAVE_PATH:-checkpoints}" "$@"
# Useful extra flags (pass through "$@"):
#   --resume                         resume from the latest checkpoint
#   --tp N --fsdp M                  tensor-parallel / FSDP mesh axes
#   --coordinator host:port --num_processes P --process_id I
#                                    multi-host (jax.distributed) launch
