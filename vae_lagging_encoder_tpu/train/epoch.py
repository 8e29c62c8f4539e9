"""Whole-epoch fused training and evaluation programs.

TPU-first redesign of the reference's per-step host loop (<ref>text.py
§main step loop, SURVEY.md §3.1). Measured on this box, a single tunneled
dispatch costs ~47 ms — a per-step host loop caps throughput at ~20
steps/s regardless of compute. So the ENTIRE epoch (shuffled batch order,
optional aggressive inner loop per step, KL-weight annealing, gradient
clipping, enc/dec SGD updates, metric accumulation) compiles to one XLA
program: a ``lax.fori_loop`` over the device-resident BucketedPool with a
``lax.switch`` over bucket lengths, so each step pays its own sequence
length exactly as the reference's length-homogeneous batches did.

Evaluation (ELBO / MI / AU / IW-NLL over a pool) uses the same
reduce-over-pool skeleton.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pool import BucketedPool
from ..models.vae import VAE
from .aggressive import make_aggressive_inner
from .optim import clip_by_global_norm, sgd_update


def make_loss_fn(vae: VAE, nsamples: int = 1, train: bool = True) -> Callable:
    """(params, key, tokens, mask, row_weight, kl_weight) ->
    (mean_loss, (loss_sum, rec_sum, kl_sum, n_sents, n_words)).

    mean_loss is the reference's ``loss.mean()`` objective (per real
    sentence); the aux sums feed epoch-level reporting.
    """

    def loss_fn(params, key, tokens, mask, row_weight, kl_weight):
        loss, rec, kl = vae.loss(params, key, tokens, mask, row_weight,
                                 kl_weight=kl_weight, nsamples=nsamples,
                                 train=train)
        n_sents = row_weight.sum()
        n_words = (mask[:, 1:] * row_weight[:, None]).sum()
        loss_sum = loss.sum()
        return loss_sum / jnp.maximum(n_sents, 1.0), (
            loss_sum, rec.sum(), kl.sum(), n_sents, n_words)

    return loss_fn


def _flat_coords(pool: BucketedPool) -> Tuple[np.ndarray, np.ndarray]:
    """Host arrays mapping flat batch index -> (bucket, idx-in-bucket)."""
    buckets = np.concatenate([np.full(int(c), k, np.int32)
                              for k, c in enumerate(pool.counts)])
    idxs = np.concatenate([np.arange(int(c), dtype=np.int32)
                           for c in pool.counts])
    return buckets, idxs


def make_train_epoch(vae: VAE, pool: BucketedPool, cfg) -> Callable:
    """Build ``epoch_fn(params, key, kl_weight, lr, order, aggressive) ->
    (params, kl_weight, stats, total_inner_iters)``.

    ``order`` is a host-shuffled permutation of flat batch indices (the
    reference shuffles its batch list each epoch); ``aggressive`` is a
    static bool (the flag flips at most once per run, costing one recompile
    when the MI plateau switches it off permanently).
    """
    loss_fn = make_loss_fn(vae, nsamples=cfg.nsamples, train=True)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    inner = make_aggressive_inner(loss_fn, pool, cfg.clip_grad,
                                  cfg.burn_max_iters, cfg.burn_window)
    flat_bucket, flat_idx = _flat_coords(pool)
    flat_bucket = jnp.asarray(flat_bucket)
    flat_idx = jnp.asarray(flat_idx)
    anneal_rate = (1.0 - cfg.kl_start) / (cfg.warm_up * pool.num_batches)

    @partial(jax.jit, static_argnames=("aggressive",), donate_argnums=(0,))
    def epoch_fn(params, key, kl_weight, lr, order, aggressive: bool = False):
        def body(i, state):
            params, key, kl_weight, sums, inner_iters = state
            key, k_inner, k_loss = jax.random.split(key, 3)
            flat = order[i]
            bucket, idx = flat_bucket[flat], flat_idx[flat]

            if aggressive:
                # <ref>text.py §3.2: encoder-only sub-updates to plateau,
                # BEFORE this step's decoder update, at the current kl_weight.
                params, n_sub = inner(params, k_inner, kl_weight, lr)
                inner_iters = inner_iters + n_sub

            kl_weight = jnp.minimum(1.0, kl_weight + anneal_rate)

            def grad_on(tokens, mask, row_weight):
                (_, aux), grads = grad_fn(params, k_loss, tokens, mask,
                                          row_weight, kl_weight)
                return grads, aux

            grads, aux = pool.switch(bucket, idx, grad_on)
            grads, _ = clip_by_global_norm(grads, cfg.clip_grad)
            if aggressive:
                # decoder-only step while the aggressive flag is on
                dec_new, _ = sgd_update(params["dec"], grads["dec"], lr)
                params = dict(params, dec=dec_new)
            else:
                params, _ = sgd_update(params, grads, lr)
            sums = jax.tree.map(jnp.add, sums, aux)
            return params, key, kl_weight, sums, inner_iters

        zeros = tuple(jnp.float32(0.0) for _ in range(5))
        params, _, kl_weight, sums, inner_iters = jax.lax.fori_loop(
            0, pool.num_batches, body,
            (params, key, kl_weight, zeros, jnp.int32(0)))
        return params, kl_weight, sums, inner_iters

    return epoch_fn


def make_pool_reducer(pool: BucketedPool, batch_fn: Callable, init) -> Callable:
    """Build ``reduce_fn(params, key) -> summed pytree`` where
    ``batch_fn(params, key, tokens, mask, row_weight)`` returns a pytree of
    scalars added across every batch in the pool (one fused XLA program)."""
    flat_bucket, flat_idx = map(jnp.asarray, _flat_coords(pool))

    @jax.jit
    def reduce_fn(params, key):
        def body(i, acc):
            k_i = jax.random.fold_in(key, i)

            def on(tokens, mask, row_weight):
                return batch_fn(params, k_i, tokens, mask, row_weight)

            out = pool.switch(flat_bucket[i], flat_idx[i], on)
            return jax.tree.map(jnp.add, acc, out)

        return jax.lax.fori_loop(0, pool.num_batches, body, init)

    return reduce_fn


# ---------------------------------------------------------------------------
# Evaluation suites over a pool (parity: <ref>text.py §test/§calc_mi/
# §calc_au/§calc_iwnll — SURVEY.md §3.3), each as ONE fused device program.

def make_eval_fn(vae: VAE, pool: BucketedPool, nsamples: int = 1) -> Callable:
    """ELBO evaluation: returns dict(loss, rec, kl per sentence; ppl)."""
    loss_fn = make_loss_fn(vae, nsamples=nsamples, train=False)

    def batch_fn(params, key, tokens, mask, row_weight):
        _, sums = loss_fn(params, key, tokens, mask, row_weight, 1.0)
        return sums

    init = tuple(jnp.float32(0.0) for _ in range(5))
    reducer = make_pool_reducer(pool, batch_fn, init)

    def eval_fn(params, key):
        loss_s, rec_s, kl_s, n_sent, n_words = map(
            float, jax.device_get(reducer(params, key)))
        return {
            "loss": loss_s / n_sent, "rec": rec_s / n_sent, "kl": kl_s / n_sent,
            "nll": (rec_s + kl_s) / n_sent,
            "ppl": math.exp((rec_s + kl_s) / n_words),
            "n_sents": n_sent, "n_words": n_words,
        }

    return eval_fn


def make_mi_fn(vae: VAE, pool: BucketedPool) -> Callable:
    """Corpus MI: batch-size-weighted mean of per-batch MI estimates
    (parity: <ref>text.py §calc_mi)."""

    def batch_fn(params, key, tokens, mask, row_weight):
        mi = vae.calc_mi_q(params, key, tokens, mask, row_weight)
        n = row_weight.sum()
        return (mi * n, n)

    reducer = make_pool_reducer(pool, batch_fn, (jnp.float32(0.0), jnp.float32(0.0)))

    def mi_fn(params, key):
        mi_sum, n = jax.device_get(reducer(params, key))
        return float(mi_sum / max(n, 1.0))

    return mi_fn


def make_au_fn(vae: VAE, pool: BucketedPool, delta: float = 0.01) -> Callable:
    """Active units: #dims with Var_x[mu(x)] > delta — two fused passes
    (parity: <ref>text.py §calc_au)."""
    nz = vae.nz

    def mean_batch(params, key, tokens, mask, row_weight):
        mu = vae.calc_infer_mean(params, tokens, mask)
        return (jnp.sum(mu * row_weight[:, None], axis=0), row_weight.sum())

    mean_reducer = make_pool_reducer(
        pool, mean_batch, (jnp.zeros((nz,)), jnp.float32(0.0)))

    def au_fn(params, key):
        mu_sum, n = mean_reducer(params, key)
        mu_mean = mu_sum / jnp.maximum(n, 1.0)

        def var_batch(params, key, tokens, mask, row_weight):
            mu = vae.calc_infer_mean(params, tokens, mask)
            dev = (mu - mu_mean) ** 2 * row_weight[:, None]
            return (jnp.sum(dev, axis=0),)

        var_reducer = make_pool_reducer(pool, var_batch, (jnp.zeros((nz,)),))
        (var_sum,) = var_reducer(params, key)
        var = jax.device_get(var_sum) / max(float(jax.device_get(n)) - 1.0, 1.0)
        return int((var > delta).sum()), var

    return au_fn


def make_iwnll_fn(vae: VAE, pool: BucketedPool, nsamples: int = 500,
                  ns: int = 100) -> Callable:
    """500-sample importance-weighted NLL + PPL over a pool
    (parity: <ref>text.py §calc_iwnll → <ref>vae.py §nll_iw)."""

    def batch_fn(params, key, tokens, mask, row_weight):
        nll = vae.nll_iw(params, key, tokens, mask, nsamples=nsamples, ns=ns)
        return ((nll * row_weight).sum(), row_weight.sum(),
                (mask[:, 1:] * row_weight[:, None]).sum())

    reducer = make_pool_reducer(
        pool, batch_fn, tuple(jnp.float32(0.0) for _ in range(3)))

    def iwnll_fn(params, key):
        nll_sum, n_sent, n_words = map(float, jax.device_get(reducer(params, key)))
        return {"nll": nll_sum / n_sent, "ppl": math.exp(nll_sum / n_words),
                "n_sents": n_sent, "n_words": n_words}

    return iwnll_fn
