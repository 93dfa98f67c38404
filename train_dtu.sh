#!/usr/bin/env bash
# Two-stage DTU training recipe (reference semantics):
#   stage 1 — one epoch with the classification-only loss;
#   stage 2 — resume with --regress (windowed L1 + confidence terms)
#             through epoch 16. Adam 1e-3 halved at epochs 4/8/12,
#             batch 4 at 640x512, grad clip 2.0. Data parallelism over
#             all local devices engages automatically when the batch
#             divides the device count.
set -euo pipefail

: "${MVS_TRAINING:=/home/Desktop/dtu/}"
: "${LOG_DIR:=./checkpoints/dtu}"

common=(
    --dataset dtu_yao
    --trainpath="$MVS_TRAINING"
    --trainlist lists/dtu/train.txt
    --vallist lists/dtu/val.txt
    --logdir="$LOG_DIR"
    --batch_size 4 --lr 0.001 --lrepochs 4,8,12:2
    --small_image --iteration 4
)

python train.py "${common[@]}" --epochs 1 "$@"
python train.py "${common[@]}" --epochs 16 --regress --resume "$@"
