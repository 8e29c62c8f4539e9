"""CLI config-merge tests (reference argparse+importlib merge semantics:
flags win over the per-dataset params — SURVEY.md §5 config row)."""
import pytest

from vae_lagging_encoder_tpu.cli.common import build_parser, config_from_args
from vae_lagging_encoder_tpu.cli.text import build_text_parser


def parse(argv):
    return config_from_args(build_parser().parse_args(argv))


def test_defaults_come_from_dataset_config():
    cfg = parse(["--dataset", "yahoo"])
    assert cfg.ni == 512 and cfg.enc_nh == 1024 and cfg.nz == 32
    assert cfg.use_pallas is True and cfg.optim == "sgd" and cfg.lr == 1.0
    cfg = parse(["--dataset", "omniglot"])
    assert cfg.optim == "adam" and cfg.lr == 1e-3 and cfg.batch_size == 50


def test_flags_win_over_config():
    cfg = parse(["--dataset", "omniglot", "--optim", "sgd", "--lr", "0.5",
                 "--epochs", "7", "--aggressive", "1", "--seed", "1"])
    assert cfg.optim == "sgd" and cfg.lr == 0.5 and cfg.epochs == 7
    assert cfg.aggressive is True and cfg.seed == 1
    cfg = parse(["--dataset", "yahoo", "--loop_unroll", "4"])
    assert cfg.loop_unroll == 4


def test_store_true_flags_do_not_clobber():
    cfg = parse(["--dataset", "yahoo"])  # no --eval / --resume
    assert cfg.eval is False and cfg.resume is False
    cfg = parse(["--dataset", "yahoo", "--eval", "--resume"])
    assert cfg.eval is True and cfg.resume is True


def test_reference_flag_names_exist():
    # the drop-in-parity flag set (SURVEY.md §5)
    p = build_parser()
    known = {a.dest for a in p._actions}
    for flag in ("dataset", "aggressive", "kl_start", "warm_up", "nsamples",
                 "iw_nsamples", "seed", "eval", "load_path"):
        assert flag in known, flag


def test_text_parser_generation_flags():
    p = build_text_parser()
    args = p.parse_args(["--dataset", "synthetic", "--sample_from_prior",
                         "--decoding_strategy", "beam", "--num_samples", "3"])
    assert args.sample_from_prior and args.decoding_strategy == "beam"
    with pytest.raises(SystemExit):
        p.parse_args(["--decoding_strategy", "nope"])


def test_jax_platform_flag():
    # --jax_platform cpu forces the CPU backend post-import (the axon
    # sitecustomize pins jax_platforms at interpreter start, so only the
    # config.update route works); conftest already runs us on cpu, so the
    # observable here is that apply_platform keeps/sets "cpu" and the
    # default (flag absent) touches nothing.
    import jax

    from vae_lagging_encoder_tpu.cli.common import apply_platform

    before = jax.config.jax_platforms
    args = build_parser().parse_args(["--dataset", "yahoo"])
    apply_platform(args)
    assert jax.config.jax_platforms == before
    args = build_parser().parse_args(
        ["--dataset", "yahoo", "--jax_platform", "cpu"])
    apply_platform(args)
    assert jax.config.jax_platforms == "cpu"
