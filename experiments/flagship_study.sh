#!/bin/bash
# Flagship-scale aggressive-vs-plain controlled study
# (VERDICT.md r2 "next round" #1 — the paper's central contrast at flagship
# dims on the offline substitute corpora; SURVEY.md §3.1/§6,
# <ref>text.py §main lifecycle, paper Tables 2-3 semantics).
#
# Both arms run the FULL recipe: KL anneal from 0.1 over 10 epochs,
# SGD lr 1.0 + clip 5.0, LR-plateau decay with rollback-to-best,
# max_decay 5 early-stop, MI-plateau aggressive switch-off (arm 1),
# periodic fault-tolerance autosave, final 500-sample IW suite.
#
# Usage (repo root, real TPU):
#     bash experiments/flagship_study.sh [yahoo|yelp|docs_english] [seed]
# A non-default seed suffixes the run dirs/checkpoints (multi-seed
# robustness studies).
set -u
cd "$(dirname "$0")/.."
DS="${1:-yahoo}"
SEED="${2:-783435}"
SUF=""
[ "$SEED" != "783435" ] && SUF="_s$SEED"
mkdir -p "models/$DS"

echo "=== $DS arm 1: aggressive (paper's algorithm), seed $SEED ==="
timeout 14400 python -m vae_lagging_encoder_tpu.cli.text --dataset "$DS" \
    --aggressive 1 --autosave_niter 5000 --seed "$SEED" \
    --save_path "models/$DS/r3_aggr$SUF.ckpt" \
    --exp_dir "models/$DS/r3_flagship_aggr$SUF"

echo "=== $DS arm 2: plain VAE (KL anneal only), seed $SEED ==="
timeout 14400 python -m vae_lagging_encoder_tpu.cli.text --dataset "$DS" \
    --aggressive 0 --autosave_niter 5000 --seed "$SEED" \
    --save_path "models/$DS/r3_plain$SUF.ckpt" \
    --exp_dir "models/$DS/r3_flagship_plain$SUF"
