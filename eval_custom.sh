#!/usr/bin/env bash
# Custom-scene evaluation: a COLMAP scene converted by
# tools/colmap_input.py (images/ cams_1/ pair.txt). Set --img_wh to
# your resolution (multiples of 32). Extra args pass through.
set -euo pipefail

: "${CUSTOM_TESTING:=/home/Desktop/custom/}"
# Default to the vendored self-contained weights (torch-free .npz
# conversion of the released checkpoint). Override CKPT_FILE with a
# reference torch .ckpt to run the original pickle through the
# importer (engine/torch_import.py).
: "${CKPT_FILE:=./checkpoints/dtu/model_000015.npz}"
: "${OUT_DIR:=./outputs}"

python eval.py \
    --dataset=custom \
    --testpath="$CUSTOM_TESTING" \
    --loadckpt "$CKPT_FILE" \
    --outdir="$OUT_DIR" \
    --batch_size=1 --n_views 7 --iteration 4 --img_wh 640 480 \
    --geo_pixel_thres=1 --geo_depth_thres=0.01 --photo_thres=0.3 \
    "$@"
