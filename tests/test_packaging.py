"""Clean-venv packaging smoke test (VERDICT r4 item 8).

The wheel (pyproject.toml console scripts + optional native extension)
must work OUTSIDE the repo checkout: build offline, install into a fresh
venv, drive ``vae-tpu-text``/``vae-tpu-toy`` from a foreign cwd. The
whole flow lives in ``experiments/packaging_smoke.sh`` (runnable by hand);
this wraps it as a slow test so the suite guards it.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # wheel build + venv + two CPU CLI lifecycles (~4 min)
def test_wheel_installs_and_console_scripts_run():
    env = dict(os.environ)
    # the venv'd CLIs must not inherit a TPU grab while the suite runs
    env.setdefault("JAX_PLATFORMS", "cpu")
    out = subprocess.run(
        ["bash", os.path.join(REPO, "experiments", "packaging_smoke.sh")],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "PACKAGING SMOKE OK" in out.stdout
