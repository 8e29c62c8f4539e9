#!/bin/bash
# Round-5 re-run of the 100k-sentence aggressive study (VERDICT r4 item 7):
# same corpus/seed/recipe as experiments/fullscale_study.sh's r3 run, but
# under the CURRENT defaults — auto --epoch_segment (32 aggressive / 256
# plain dispatch sizing, r4) + autosave — to substantiate the claimed
# plain-phase wall-clock recovery at scale and confirm the segmented final
# IW suite survives. r3 baselines (same seed 783435, same box): aggressive
# arm 89 min, plain arm 18 min (RESULTS.md "Full dataset scale").
#
# Usage (repo root, real TPU): bash experiments/fullscale_study_r5.sh
set -u
cd "$(dirname "$0")/.."
SEED=783435
mkdir -p models/yahoo100k

echo "=== materialize 110k-sentence corpus (cached if present) ==="
python -c "
from vae_lagging_encoder_tpu.data.synthetic import ensure_flagship_dataset
print(ensure_flagship_dataset('yahoo100k', num_sentences=110000))
"

DATA="--dataset yahoo \
  --train_data datasets/yahoo100k_data/yahoo100k.train.txt \
  --val_data datasets/yahoo100k_data/yahoo100k.valid.txt \
  --test_data datasets/yahoo100k_data/yahoo100k.test.txt"

echo "=== arm 1: aggressive, seed $SEED, r5 defaults ==="
T0=$(date +%s)
timeout 14000 python -m vae_lagging_encoder_tpu.cli.text $DATA \
    --aggressive 1 --autosave_niter 20000 --seed "$SEED" \
    --save_path "models/yahoo100k/r5_aggr.ckpt" \
    --exp_dir "models/yahoo100k/r5_fullscale_aggr"
echo "ARM1_WALL_S=$(( $(date +%s) - T0 ))"

echo "=== arm 2: plain VAE (KL anneal only), seed $SEED, r5 defaults ==="
T1=$(date +%s)
timeout 14000 python -m vae_lagging_encoder_tpu.cli.text $DATA \
    --aggressive 0 --autosave_niter 20000 --seed "$SEED" \
    --save_path "models/yahoo100k/r5_plain.ckpt" \
    --exp_dir "models/yahoo100k/r5_fullscale_plain"
echo "ARM2_WALL_S=$(( $(date +%s) - T1 ))"

echo "=== done; summaries ==="
tail -2 models/yahoo100k/r5_fullscale_aggr/log.txt 2>/dev/null
tail -2 models/yahoo100k/r5_fullscale_plain/log.txt 2>/dev/null
