#!/bin/bash
# Pure-inference serving preset: denoise a directory of NEW frames (no
# clean/ ground truth) with the production tiled pipeline — bf16 compute,
# 8-frame bursts, sublane-filling tile chunks (docs/PERF.md §3, §9).
# Outputs are byte-identical to eval_704.sh's *_denoised.png at
# --dtype float32 --tile_batch -1; this preset trades reference-exact
# numerics for throughput (agreement within 49 dB / <=4 uint8 levels).
INPUT_DIR="./dataset/m1/noise"
CHECKPOINT="results/UNetImproved/<run>/epoch_model_100.ckpt"
SAVE_DIR="./denoised"
N_CHANNEL=1
N_FEATURE=48

python3 -m image_denoising_tpu.cli.denoise \
    --input_dir $INPUT_DIR \
    --checkpoint $CHECKPOINT \
    --save_dir $SAVE_DIR \
    --n_channel $N_CHANNEL \
    --n_feature $N_FEATURE \
    --dtype bfloat16 \
    --frame_burst 8 \
    --tile_batch -8
