#!/bin/bash
# Tiled-352 evaluation — TPU production-throughput preset.
# Same outputs as eval_704.sh within the 0.05 dB acceptance bar; ~70% faster
# on one v5e (docs/PERF.md): bf16 compute, 8-frame bursts (two in flight),
# 8-tile sublane-filling scan chunks. Add --parallel on a multi-chip host to
# shard the burst's tile stack over the mesh.
DATA_DIR="./dataset/m1"
CHECKPOINT="results/UNetImproved/<run>/epoch_model_100.ckpt"
SAVE_DIR="./eval_improvedunet_test_704"
N_CHANNEL=1
N_FEATURE=48

python3 -m image_denoising_tpu.cli.evaluation_704 \
    --data_dir $DATA_DIR \
    --checkpoint $CHECKPOINT \
    --save_dir $SAVE_DIR \
    --n_channel $N_CHANNEL \
    --n_feature $N_FEATURE \
    --dtype bfloat16 \
    --frame_burst 8 \
    --tile_batch -8
