"""Image experiment CLI — parity with <ref>image.py (SURVEY.md §3.4).

Usage (reference-compatible):
    python -m vae_lagging_encoder_tpu.cli.image --dataset omniglot --aggressive 1
    python -m vae_lagging_encoder_tpu.cli.image --dataset omniglot --eval \
        --load_path models/omniglot/model.ckpt
"""
from __future__ import annotations

import json
import sys

from ..train.loop import train_image
from .common import build_parser, config_from_args, make_run_logger


def init_config(argv=None):
    args = build_parser(default_dataset="omniglot").parse_args(argv)
    cfg = config_from_args(args)
    if cfg.model_type != "image":
        raise SystemExit(f"--dataset {cfg.dataset} is not an image dataset; "
                         "use vae_lagging_encoder_tpu.cli.text")
    return cfg


def main(argv=None) -> int:
    cfg = init_config(argv)
    with make_run_logger(cfg, "image") as log:
        log.info(f"[config] {cfg}")
        results = train_image(cfg, log)
        log.info("[results] " + json.dumps(
            {k: v for k, v in results.items() if k != "history"},
            default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
