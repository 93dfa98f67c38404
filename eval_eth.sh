#!/usr/bin/env bash
# ETH3D high-res evaluation (train + test splits) at 1920x1280 with
# N=7 views; per-scene geo_mask thresholds applied by eval.py. Use
# CKPT_FILE to pick DTU- or BlendedMVS-trained weights.
set -euo pipefail

: "${ETH3D_TESTING:=/home/Desktop/eth3d_high_res_test/}"
# Default to the vendored self-contained weights (torch-free .npz
# conversion of the released checkpoint). Override CKPT_FILE with a
# reference torch .ckpt to run the original pickle through the
# importer (engine/torch_import.py).
: "${CKPT_FILE:=./checkpoints/dtu/model_000015.npz}"
: "${OUT_DIR:=./outputs}"

for split in train test; do
    python eval.py \
        --dataset=eth3d --split "$split" \
        --testpath="$ETH3D_TESTING" \
        --loadckpt "$CKPT_FILE" \
        --outdir="$OUT_DIR" \
        --batch_size=1 --n_views 7 --iteration 4 \
        --geo_pixel_thres=1 --geo_depth_thres=0.01 --photo_thres=0.3 \
        "$@"
done
