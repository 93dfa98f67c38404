#!/usr/bin/env bash
# DTU evaluation: per-view depth + confidence inference on TPU, then
# geometric fusion to per-scan point clouds (itermvsNNN_l3.ply).
# Flags mirror the reference recipe (eval at 1600x1152, N=5, fusion
# thresholds 1px / 0.01 rel depth / 0.3 confidence, geo_mask 4).
# Extra args pass through, e.g. `bash eval_dtu.sh --precision bfloat16`.
set -euo pipefail

: "${DTU_TESTING:=/home/Desktop/dtu/}"
# Default to the vendored self-contained weights (torch-free .npz
# conversion of the released checkpoint). Override CKPT_FILE with a
# reference torch .ckpt to run the original pickle through the
# importer (engine/torch_import.py).
: "${CKPT_FILE:=./checkpoints/dtu/model_000015.npz}"
: "${OUT_DIR:=./outputs}"

python eval.py \
    --dataset=dtu_yao_eval \
    --testpath="$DTU_TESTING" \
    --testlist lists/dtu/test.txt \
    --loadckpt "$CKPT_FILE" \
    --outdir="$OUT_DIR" \
    --batch_size=1 --n_views 5 --iteration 4 \
    --geo_pixel_thres=1 --geo_depth_thres=0.01 --photo_thres=0.3 \
    "$@"
