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
python -m venv "$WORK/venv"
# the deps (jax/numpy) are baked into the HOST environment, which is
# itself a venv — --system-site-packages would skip it. Link the host's
# site-packages via a .pth so the fresh venv resolves the baked-in deps
# (offline box; nothing is fetchable) while the wheel under test is the
# only copy of THIS package.
HOST_SITE="$(python -c 'import numpy, os; print(os.path.dirname(os.path.dirname(numpy.__file__)))')"
VENV_SITE="$("$WORK/venv/bin/python" -c 'import site; print(site.getsitepackages()[0])')"
echo "$HOST_SITE" > "$VENV_SITE/_host_deps.pth"
"$WORK/venv/bin/pip" install --no-deps --no-index -q "$WHEEL"
# the import must resolve to the WHEEL's copy inside the fresh venv,
# not a checkout leaking in via cwd/path (run from a neutral cwd — for
# stdin scripts sys.path[0] is the cwd, and the repo checkout would win)
cd "$WORK"
VENV_SITE="$VENV_SITE" "$WORK/venv/bin/python" - <<'EOF'
import os
import vae_lagging_encoder_tpu as m
assert m.__file__.startswith(os.environ["VENV_SITE"]), m.__file__
EOF

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
