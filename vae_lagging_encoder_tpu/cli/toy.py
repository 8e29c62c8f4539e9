"""Toy posterior-mean-space tracing — parity with <ref>toy.py (SURVEY §3.5).

Trains the 1-D-latent LSTM-VAE on the synthetic corpus and, every
``--plot_niter`` epochs, records for a fixed probe set of sentences the pair

    ( ⟨z⟩_{p(z|x)}  — TRUE model posterior mean by grid quadrature over z
                      using decoder likelihoods,
      μ(x)          — approximate posterior mean from the encoder )

dumping pickles under ``plot_data/`` that plot_scripts/ renders into the
paper's posterior-mean-space figures (collapse-to-x-axis vs diagonal).

Usage:
    python -m vae_lagging_encoder_tpu.cli.toy --dataset synthetic \
        --aggressive 1 --epochs 20 --plot_niter 1
"""
from __future__ import annotations

import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BucketedPool
from ..models import build_text_vae
from ..train.epoch import make_train_epoch
from ..train.loop import load_text_datasets
from ..utils.exp_utils import Logger
from .common import apply_platform, build_parser, config_from_args


def init_config(argv=None):
    p = build_parser(default_dataset="synthetic")
    p.add_argument("--plot_niter", type=int, default=1,
                   help="epochs between posterior-mean-space probes")
    p.add_argument("--num_plot", type=int, default=500,
                   help="number of probe sentences")
    p.add_argument("--zmin", type=float, default=-20.0)
    p.add_argument("--zmax", type=float, default=20.0)
    p.add_argument("--dz", type=float, default=0.1)
    p.add_argument("--plot_dir", type=str, default="plot_data")
    args = p.parse_args(argv)
    apply_platform(args)
    cfg = config_from_args(args)
    if cfg.nz != 1:
        raise SystemExit("toy tracing requires nz=1 (use --dataset synthetic)")
    return cfg, args


def main(argv=None) -> int:
    cfg, args = init_config(argv)
    log = Logger()
    train_data, val_data, _ = load_text_datasets(cfg)
    pool = BucketedPool(train_data.create_data_batch(cfg.batch_size,
                                                     cfg.length_buckets))
    vae = build_text_vae(cfg, len(train_data.vocab))
    params = vae.init(jax.random.PRNGKey(cfg.seed))
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    opt_state = opt_init(params)

    # fixed probe batches (first num_plot sentences, same every probe —
    # parity with the reference's tracked data points)
    probe_batches = []
    n = 0
    flat = [(b, i) for b in range(pool.num_buckets)
            for i in range(int(pool.counts[b]))]
    for b, i in flat:
        if n >= args.num_plot:
            break
        arrs = tuple(a[i] for a in pool.arrays[b])
        probe_batches.append(arrs)
        n += arrs[2].sum()
    z_grid = jnp.arange(args.zmin, args.zmax, args.dz)[:, None]  # [G, 1]
    log.info(f"[toy] probing {n} sentences on a {z_grid.shape[0]}-point z grid")

    @jax.jit
    def probe(params, tokens, mask, row_weight):
        post = vae.calc_model_posterior_mean(params, tokens, mask, z_grid)
        infer = vae.calc_infer_mean(params, tokens, mask)
        return post, infer, row_weight

    os.makedirs(args.plot_dir, exist_ok=True)
    rng = np.random.RandomState(cfg.seed)
    master_key = jax.random.PRNGKey(cfg.seed)
    kl_weight = float(cfg.kl_start)
    aggressive = bool(cfg.aggressive)
    trace = []

    def record(epoch):
        pairs = []
        for arrs in probe_batches:
            post, infer, w = map(np.asarray, probe(params, *arrs))
            keep = w > 0
            pairs.append(np.stack([post[keep, 0], infer[keep, 0]], axis=1))
        pairs = np.concatenate(pairs)[: args.num_plot]
        trace.append({"epoch": epoch, "pairs": pairs})
        path = os.path.join(args.plot_dir, f"{cfg.dataset}_aggr{int(cfg.aggressive)}"
                            f"_seed{cfg.seed}.pkl")
        with open(path, "wb") as fh:
            pickle.dump(trace, fh)
        log.info(f"[toy] epoch {epoch}: recorded {len(pairs)} (⟨z⟩_post, μ) "
                 f"pairs -> {path}")

    record(-1)  # before training
    for epoch in range(cfg.epochs):
        order = jnp.asarray(rng.permutation(pool.num_batches).astype(np.int32))
        params, opt_state, klw, sums, inner = epoch_fn(
            params, opt_state, jax.random.fold_in(master_key, epoch),
            jnp.float32(kl_weight), jnp.float32(cfg.lr), order,
            aggressive=aggressive)
        kl_weight = float(klw)
        loss_s, rec_s, kl_s, n_sent, _ = map(float, jax.device_get(sums))
        log.info(f"epoch {epoch}: loss {loss_s / n_sent:.4f} "
                 f"kl {kl_s / n_sent:.4f} inner {int(inner)}")
        if (epoch + 1) % args.plot_niter == 0:
            record(epoch)
    return 0


if __name__ == "__main__":
    sys.exit(main())
