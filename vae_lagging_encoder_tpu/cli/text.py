"""Text experiment CLI — parity with <ref>text.py (SURVEY.md §3.1).

Usage (reference-compatible):
    python -m vae_lagging_encoder_tpu.cli.text --dataset yahoo --aggressive 1
    python -m vae_lagging_encoder_tpu.cli.text --dataset yelp
    python -m vae_lagging_encoder_tpu.cli.text --dataset synthetic --epochs 5
    python -m vae_lagging_encoder_tpu.cli.text --dataset yahoo --eval \
        --load_path models/yahoo/model.ckpt
    # resume a killed run
    ... --load_path models/yahoo/model.ckpt --resume
    # generation / reconstruction from a trained checkpoint
    ... --load_path ck --sample_from_prior --num_samples 20
    ... --load_path ck --reconstruct --decoding_strategy beam
"""
from __future__ import annotations

import json
import sys

from ..train.loop import train_text
from .common import apply_platform, build_parser, config_from_args, make_run_logger


def build_text_parser():
    p = build_parser(default_dataset="yahoo")
    p.add_argument("--sample_from_prior", action="store_true",
                   help="sample sentences from the prior (needs --load_path)")
    p.add_argument("--reconstruct", action="store_true",
                   help="reconstruct test sentences (needs --load_path)")
    p.add_argument("--decoding_strategy", type=str, default="greedy",
                   choices=["greedy", "sample", "beam"])
    p.add_argument("--num_samples", type=int, default=10)
    p.add_argument("--max_decode_len", type=int, default=100)
    p.add_argument("--output_file", type=str, default="")
    return p


def init_config(argv=None):
    args = build_text_parser().parse_args(argv)
    apply_platform(args)
    cfg = config_from_args(args)
    if cfg.model_type != "text":
        raise SystemExit(f"--dataset {cfg.dataset} is not a text dataset; "
                         "use vae_lagging_encoder_tpu.cli.image")
    return cfg, args


def generate(cfg, args, log) -> int:
    """Prior sampling / test-set reconstruction from a checkpoint.

    Parity: <ref>vae.py §sample_from_prior/§reconstruct driven from the
    experiment script; greedy/sample AND beam decode all run on device
    (batched beam search — models/dec_lstm.py::_beam_search_batched).
    """
    import jax
    import jax.numpy as jnp

    from ..data import MonoTextData
    from ..models import build_text_vae
    from ..train.checkpoint import load_checkpoint
    from ..train.loop import dataset_is_labeled

    if not cfg.load_path:
        raise SystemExit("--sample_from_prior/--reconstruct need --load_path")
    # only the train split's vocab is needed (plus test for --reconstruct);
    # loading all three splits wasted startup I/O at 100k-corpus scale
    label = dataset_is_labeled(cfg)
    train_data = MonoTextData(cfg.train_data, label=label)
    vocab = train_data.vocab
    vae = build_text_vae(cfg, len(vocab))
    params, _ = load_checkpoint(cfg.load_path)
    params = jax.tree.map(jnp.asarray, params)  # host numpy -> device
    # independent keys per use: reusing one key would correlate the prior
    # draw with the decode-sampling noise (code-review r3)
    k_z, k_dec = jax.random.split(jax.random.PRNGKey(cfg.seed))
    lines = []
    if args.sample_from_prior:
        z = vae.sample_from_prior(k_z, args.num_samples)
        if args.decoding_strategy == "beam":
            outs = vae.decoder.beam_search_decode(params["dec"], z,
                                                  max_len=args.max_decode_len)
        elif args.decoding_strategy == "sample":
            outs = vae.decoder.sample_decode(params["dec"], k_dec, z,
                                             args.max_decode_len)
        else:
            outs = vae.decoder.greedy_decode(params["dec"], z,
                                             args.max_decode_len)
        lines = [" ".join(vocab.decode(row)) for row in list(outs)]
    else:  # reconstruct
        test_data = MonoTextData(cfg.test_data, label=label,
                                 vocab=vocab)
        batches = test_data.create_data_batch(cfg.batch_size, cfg.length_buckets)
        # ceil so num_samples > batch_size fetches enough batches; per-batch
        # keys so batches don't share posterior/decode noise (code-review r3)
        n_batches = -(-args.num_samples // cfg.batch_size)
        for i, b in enumerate(batches[:n_batches]):
            outs = vae.reconstruct(params, jax.random.fold_in(k_dec, i),
                                   jnp.asarray(b.tokens),
                                   jnp.asarray(b.mask),
                                   decoding_strategy=args.decoding_strategy,
                                   max_len=args.max_decode_len)
            for row, w in zip(list(outs), b.row_weight):
                if w > 0:
                    lines.append(" ".join(vocab.decode(row)))
        lines = lines[: args.num_samples]
    text = "\n".join(lines)
    if args.output_file:
        with open(args.output_file, "w") as fh:
            fh.write(text + "\n")
        log.info(f"[generate] {len(lines)} sentences -> {args.output_file}")
    else:
        log.info(text)
    return 0


def main(argv=None) -> int:
    cfg, args = init_config(argv)
    with make_run_logger(cfg, "text") as log:
        log.info(f"[config] {cfg}")
        if args.sample_from_prior or args.reconstruct:
            return generate(cfg, args, log)
        results = train_text(cfg, log)
        log.info("[results] " + json.dumps(
            {k: v for k, v in results.items() if k != "history"},
            default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
