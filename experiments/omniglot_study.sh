#!/bin/bash
# OmniGlot aggressive-vs-plain contrast (paper Table 3 semantics) on the
# offline synthetic substitute — the image-side companion of
# experiments/flagship_study.sh. Epochs capped: the contrast (plain KL
# collapse vs aggressive holding MI/KL) emerges long before the
# reference's 500-epoch budget, and the box's TPU time is shared.
#
# Usage (repo root, real TPU):  bash experiments/omniglot_study.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p models/omniglot

echo "=== arm 1: aggressive ==="
timeout 10800 python -m vae_lagging_encoder_tpu.cli.image --dataset omniglot \
    --aggressive 1 --epochs 60 --autosave_niter 20000 \
    --save_path models/omniglot/r3_aggr.ckpt \
    --exp_dir models/omniglot/r3_study_aggr

echo "=== arm 2: plain ==="
timeout 10800 python -m vae_lagging_encoder_tpu.cli.image --dataset omniglot \
    --aggressive 0 --epochs 60 --autosave_niter 20000 \
    --save_path models/omniglot/r3_plain.ckpt \
    --exp_dir models/omniglot/r3_study_plain
