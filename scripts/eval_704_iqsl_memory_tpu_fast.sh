#!/bin/bash
# Memory-adapter Hann eval — TPU production preset at the FULL reference
# memory config (patch 128 / overlap 64 / 5 memory pairs / stride 4 ⇒
# ~105k-patch bank, eval_704_iqsl_memory.sh:34-38). Identical PSNR to the
# float32 banks (int8 distances are exact integers; the uint8 clean store
# is lossless), ~3.4 GB bank HBM instead of 10.3, streaming Pallas
# retrieval hoisted out of the tile scan (docs/PERF.md §7.1).
DATA_DIR="./dataset/m1"
BASE_CKPT="results/UNetImproved/<run>/epoch_model_100.ckpt"
ADAPTER_CKPT="results_ft/UNetImproved_memory_adapter_ft/epoch_adapter_only_050.ckpt"
SAVE_DIR="./results_704_eval_adapter_memory"

python3 -m image_denoising_tpu.cli.evaluation_704_iqsl_memory \
    --data_dir $DATA_DIR \
    --base_ckpt $BASE_CKPT \
    --adapter_ckpt $ADAPTER_CKPT \
    --save_dir $SAVE_DIR \
    --n_channel 1 \
    --n_feature 48 \
    --adapter_hidden 16 \
    --patch_size 128 \
    --overlap 64 \
    --num_memory_images 5 \
    --memory_stride 4 \
    --compute_iq_iou \
    --dtype bfloat16 \
    --frame_burst 4 \
    --tile_batch -8 \
    --bank_dtype int8 \
    --clean_bank_dtype uint8 \
    --pallas_retrieval
