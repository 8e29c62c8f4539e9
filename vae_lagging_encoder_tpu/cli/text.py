"""Text experiment CLI — parity with <ref>text.py (SURVEY.md §3.1).

Usage (reference-compatible):
    python -m vae_lagging_encoder_tpu.cli.text --dataset yahoo --aggressive 1
    python -m vae_lagging_encoder_tpu.cli.text --dataset yelp
    python -m vae_lagging_encoder_tpu.cli.text --dataset synthetic --epochs 5
    python -m vae_lagging_encoder_tpu.cli.text --dataset yahoo --eval \
        --load_path models/yahoo/model.ckpt
"""
from __future__ import annotations

import json
import sys

from ..train.loop import train_text
from .common import build_parser, config_from_args, make_run_logger


def init_config(argv=None):
    args = build_parser(default_dataset="yahoo").parse_args(argv)
    cfg = config_from_args(args)
    if cfg.model_type != "text":
        raise SystemExit(f"--dataset {cfg.dataset} is not a text dataset; "
                         "use vae_lagging_encoder_tpu.cli.image")
    return cfg


def main(argv=None) -> int:
    cfg = init_config(argv)
    with make_run_logger(cfg, "text") as log:
        log.info(f"[config] {cfg}")
        results = train_text(cfg, log)
        log.info("[results] " + json.dumps(
            {k: v for k, v in results.items() if k != "history"},
            default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
