"""Shared CLI plumbing: reference-compatible flags merged over per-dataset
configs (flags win), mirroring <ref>text.py/image.py §init_config's
argparse + importlib config merge (SURVEY.md §5 config row)."""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

from ..config import DATASET_CONFIGS, ExperimentConfig, get_config
from ..utils.exp_utils import Logger, create_exp_dir


def build_parser(default_dataset: str = "yahoo") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # reference flag names (<ref>text.py §init_config) -------------------
    p.add_argument("--dataset", type=str, default=default_dataset,
                   choices=sorted(DATASET_CONFIGS))
    p.add_argument("--aggressive", type=int, default=None,
                   help="1 = lagging-encoder inner loop (paper's algorithm)")
    p.add_argument("--kl_start", type=float, default=None)
    p.add_argument("--warm_up", type=int, default=None)
    p.add_argument("--nsamples", type=int, default=None)
    p.add_argument("--iw_nsamples", type=int, default=None)
    p.add_argument("--iw_batch", type=int, default=None,
                   help="IW estimator chunk size (ns in <ref>vae.nll_iw); "
                        "iw_nsamples must divide by it")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--load_path", type=str, default=None)
    p.add_argument("--resume", action="store_true",
                   help="continue training from load_path's saved state")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--optim", type=str, default=None, choices=["sgd", "adam"])
    p.add_argument("--momentum", type=float, default=None)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--decay_epoch", type=int, default=None)
    p.add_argument("--lr_decay", type=float, default=None)
    p.add_argument("--max_decay", type=int, default=None)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--exp_dir", type=str, default=None)
    p.add_argument("--label", type=int, default=None)
    p.add_argument("--log_niter", type=int, default=None)
    p.add_argument("--test_nepoch", type=int, default=None)
    # model dims (<ref>text.py §init_config exposes these too; per-dataset
    # config supplies the defaults, flags win)
    p.add_argument("--ni", type=int, default=None,
                   help="embedding size")
    p.add_argument("--enc_nh", type=int, default=None,
                   help="encoder LSTM hidden size")
    p.add_argument("--dec_nh", type=int, default=None,
                   help="decoder LSTM hidden size")
    p.add_argument("--nz", type=int, default=None,
                   help="latent dimension")
    p.add_argument("--dec_dropout_in", type=float, default=None)
    p.add_argument("--dec_dropout_out", type=float, default=None)
    # TPU-first additions -------------------------------------------------
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--use_pallas", type=int, default=None)
    p.add_argument("--dp_devices", type=int, default=None)
    p.add_argument("--tp_devices", type=int, default=None,
                   help="vocab-shard the decoder's output projection + CE "
                        "over this many tensor-parallel devices (text "
                        "models; composes with --dp_devices on a 2-D mesh)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of one epoch here")
    p.add_argument("--epoch_segment", type=int, default=None,
                   help="max batches per device dispatch; default auto "
                        "(32 aggressive / 256 plain, watchdog-bounded); "
                        "explicit N is capped by --log_niter for exact "
                        "log cadence; 0 = whole epoch")
    p.add_argument("--loop_unroll", type=int, default=None,
                   help="unroll factor for the fused plain-epoch loop "
                        "(bit-exact scheduling knob; measured neutral on "
                        "v5e-1 at flagship shape — see RESULTS.md)")
    p.add_argument("--autosave_niter", type=int, default=None,
                   help="fault-tolerance autosave every N steps to "
                        "<save_path>.auto; --resume restarts mid-epoch "
                        "(0 = off)")
    p.add_argument("--train_data", type=str, default=None)
    p.add_argument("--val_data", type=str, default=None)
    p.add_argument("--test_data", type=str, default=None)
    p.add_argument("--jax_platform", type=str, default=None,
                   choices=["cpu"],
                   help="cpu = run off-device (e.g. while the TPU is busy); "
                        "default = jax's pick (the TPU when present)")
    p.add_argument("--compile_cache_dir", type=str, default=None,
                   help="persistent XLA compilation cache; re-running the "
                        "same shapes skips compilation entirely (measured "
                        "36.6 s -> 0.7 s across processes on the tunneled "
                        "TPU). Default ~/.cache/vae_lagging_encoder_tpu/"
                        "xla; pass '' to disable")
    return p


def apply_compile_cache(args: argparse.Namespace) -> None:
    """Enable JAX's persistent compilation cache (on by default).

    Compiled executables are keyed by HLO + jax/xla version + device kind,
    so code changes recompile automatically and the cache can never serve
    a stale program. Failures (read-only home, etc.) are non-fatal — the
    run just compiles as before."""
    cache = getattr(args, "compile_cache_dir", None)
    if cache is None:
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "vae_lagging_encoder_tpu", "xla")
    if not cache:
        return
    try:
        os.makedirs(cache, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception as e:  # noqa: BLE001 — best-effort accelerator
        print(f"[warn] compilation cache disabled ({e})", file=sys.stderr)


def apply_platform(args: argparse.Namespace) -> None:
    """Force the JAX backend if --jax_platform was given.

    Must run before any computation. The axon sitecustomize pre-imports
    jax and pins jax_platforms="axon,cpu", so the env var route is dead —
    only a post-import config.update works (same dance as
    tests/conftest.py)."""
    if getattr(args, "jax_platform", None) == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    apply_compile_cache(args)


def config_from_args(args: argparse.Namespace) -> ExperimentConfig:
    fields = {f.name for f in dataclasses.fields(ExperimentConfig)}
    overrides = {}
    for k, v in vars(args).items():
        if k in fields and v is not None and k != "dataset":
            if k in ("aggressive", "label", "use_pallas"):
                v = bool(v)
            if k in ("eval", "resume") and not v:
                continue  # store_true default False shouldn't override
            overrides[k] = v
    return get_config(args.dataset, **overrides)


def make_run_logger(cfg: ExperimentConfig, kind: str) -> Logger:
    exp_dir = cfg.exp_dir or os.path.join(
        "models", cfg.dataset,
        f"exp_{kind}_aggressive{int(cfg.aggressive)}_"
        f"kls{cfg.kl_start}_warm{cfg.warm_up}_seed{cfg.seed}_{int(time.time())}")
    create_exp_dir(exp_dir, scripts_to_save=[sys.argv[0]] if sys.argv else None)
    return Logger(os.path.join(exp_dir, "log.txt"))
