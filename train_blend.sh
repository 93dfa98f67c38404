#!/usr/bin/env bash
# Two-stage BlendedMVS training recipe: one classification-only epoch,
# then --regress --resume through epoch 16. Batch 2 at 768x576
# (BlendedMVS native), Adam 1e-3 halved at epochs 4/8/12.
set -euo pipefail

: "${MVS_TRAINING:=/home/Desktop/BlendedMVS/}"
: "${LOG_DIR:=./checkpoints/blendedmvs}"

common=(
    --dataset blendedmvs
    --trainpath="$MVS_TRAINING"
    --trainlist lists/blendedmvs/train.txt
    --vallist lists/blendedmvs/val.txt
    --logdir="$LOG_DIR"
    --batch_size 2 --lr 0.001 --lrepochs 4,8,12:2
    --iteration 4
)

python train.py "${common[@]}" --epochs 1 "$@"
python train.py "${common[@]}" --epochs 16 --regress --resume "$@"
