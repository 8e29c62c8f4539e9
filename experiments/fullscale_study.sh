#!/bin/bash
# Aggressive-vs-plain study at the REFERENCE'S DATASET SCALE:
# 100k train sentences (SURVEY.md §6 [MED]: Yahoo/Yelp ~100k), vs the
# 20k-sentence substitutes of the earlier round-3 studies. Same flagship
# dims (V~20k, LSTM 512/1024, nz 32), same full recipe both arms (KL
# anneal, LR-plateau decay + rollback-to-best, 5-decay early stop,
# MI-plateau switch-off, autosave, final 500-sample IW suite).
#
# Usage (repo root, real TPU): bash experiments/fullscale_study.sh [seed]
set -u
cd "$(dirname "$0")/.."
SEED="${1:-783435}"
SUF=""
[ "$SEED" != "783435" ] && SUF="_s$SEED"
mkdir -p models/yahoo100k

echo "=== materialize 110k-sentence corpus (100k/5k/5k) ==="
python -c "
from vae_lagging_encoder_tpu.data.synthetic import ensure_flagship_dataset
paths = ensure_flagship_dataset('yahoo100k', num_sentences=110000)
print(paths)
"

DATA="--dataset yahoo \
  --train_data datasets/yahoo100k_data/yahoo100k.train.txt \
  --val_data datasets/yahoo100k_data/yahoo100k.valid.txt \
  --test_data datasets/yahoo100k_data/yahoo100k.test.txt"

echo "=== arm 1: aggressive, seed $SEED ==="
timeout 14000 python -m vae_lagging_encoder_tpu.cli.text $DATA \
    --aggressive 1 --autosave_niter 20000 --seed "$SEED" \
    --save_path "models/yahoo100k/r3_aggr$SUF.ckpt" \
    --exp_dir "models/yahoo100k/r3_fullscale_aggr$SUF"

echo "=== arm 2: plain VAE (KL anneal only), seed $SEED ==="
timeout 14000 python -m vae_lagging_encoder_tpu.cli.text $DATA \
    --aggressive 0 --autosave_niter 20000 --seed "$SEED" \
    --save_path "models/yahoo100k/r3_plain$SUF.ckpt" \
    --exp_dir "models/yahoo100k/r3_fullscale_plain$SUF"

echo "=== done; summaries ==="
tail -2 models/yahoo100k/r3_fullscale_aggr$SUF/log.txt 2>/dev/null
tail -2 models/yahoo100k/r3_fullscale_plain$SUF/log.txt 2>/dev/null
