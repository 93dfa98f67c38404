#!/usr/bin/env bash
# Tanks & Temples evaluation (intermediate + advanced splits) at
# 1920x1024 with N=7 views; per-scene geo_mask thresholds are applied
# by eval.py's fusion orchestration. Use CKPT_FILE to pick the DTU- or
# BlendedMVS-trained weights. Extra args pass through.
set -euo pipefail

: "${TANK_TESTING:=/home/Desktop/tankandtemples/}"
# Default to the vendored self-contained weights (torch-free .npz
# conversion of the released checkpoint). Override CKPT_FILE with a
# reference torch .ckpt to run the original pickle through the
# importer (engine/torch_import.py).
: "${CKPT_FILE:=./checkpoints/dtu/model_000015.npz}"
: "${OUT_DIR:=./outputs}"

for split in intermediate advanced; do
    python eval.py \
        --dataset=tanks --split "$split" \
        --testpath="$TANK_TESTING" \
        --loadckpt "$CKPT_FILE" \
        --outdir="$OUT_DIR" \
        --batch_size=1 --n_views 7 --iteration 4 \
        --geo_pixel_thres=1 --geo_depth_thres=0.01 --photo_thres=0.3 \
        "$@"
done
