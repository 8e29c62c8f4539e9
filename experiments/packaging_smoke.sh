#!/usr/bin/env bash
# Clean-venv packaging smoke test (VERDICT r4 item 8).
#
# Proves the wheel works OUTSIDE the repo checkout: builds the wheel
# offline, installs it into a FRESH venv (--system-site-packages so the
# baked-in jax/numpy resolve on this zero-egress box; --no-deps/--no-index
# so nothing is fetched), then drives the console scripts from a foreign
# working directory:
#   - vae-tpu-text --dataset synthetic --epochs 1 (full lifecycle:
#     train -> val -> final IW suite) on the CPU backend
#   - vae-tpu-toy one epoch of the 1-D posterior-mean tracing
#
# Usage: bash experiments/packaging_smoke.sh  (from the repo root)
# The same flow runs as a slow test: tests/test_packaging.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d /tmp/pkg_smoke_XXXX)"
trap 'rm -rf "$WORK"' EXIT

echo "== build wheel (offline) =="
cd "$REPO"
python -m pip wheel . --no-deps --no-build-isolation -w "$WORK/dist" -q
WHEEL="$(ls "$WORK"/dist/*.whl)"
echo "wheel: $WHEEL"

echo "== fresh venv =="
python -m venv --system-site-packages "$WORK/venv"
"$WORK/venv/bin/pip" install --no-deps --no-index -q "$WHEEL"

echo "== drive console scripts from a foreign cwd =="
mkdir -p "$WORK/run"
cd "$WORK/run"
# synthetic dataset is generated under ./datasets relative to the cwd —
# exactly what a user outside the checkout would see
"$WORK/venv/bin/vae-tpu-text" --dataset synthetic --epochs 1 \
    --jax_platform cpu --ni 16 --enc_nh 24 --dec_nh 24 --nz 4 \
    --iw_nsamples 10 --iw_batch 5 --exp_dir "$WORK/run/exp"
"$WORK/venv/bin/vae-tpu-toy" --dataset synthetic --epochs 1 \
    --jax_platform cpu --num_plot 32 --plot_dir "$WORK/run/plots" \
    --exp_dir "$WORK/run/exp_toy"
python - "$WORK/venv" <<'EOF'
import subprocess, sys
venv = sys.argv[1]
out = subprocess.run([f"{venv}/bin/python", "-c",
    "import vae_lagging_encoder_tpu as m, os;"
    "print('pkg at', os.path.dirname(m.__file__));"
    "from vae_lagging_encoder_tpu.data import native;"
    "print('native textproc in wheel:', native.available())"],
    capture_output=True, text=True)
print(out.stdout, out.stderr)
assert out.returncode == 0
EOF
echo "PACKAGING SMOKE OK"
