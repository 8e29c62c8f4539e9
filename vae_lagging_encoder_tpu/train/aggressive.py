"""The paper's aggressive inner loop as a single on-device ``lax.while_loop``.

Parity: <ref>text.py §aggressive inner loop (SURVEY.md §3.2), whose exact
host-side semantics are:

    burn_pre_loss = +inf; burn_cur_loss = burn_num_words = 0
    for sub_iter in 1..:
        sub_batch = train_batches[randint(num_batches)]   # fresh random batch
        loss = vae.loss(sub_batch, kl_weight)             # full fwd+bwd
        clip_grad_norm_(ALL params, 5.0); enc_optimizer.step()   # enc-only
        burn_cur_loss += loss.sum(); burn_num_words += words(sub_batch)
        if sub_iter % 15 == 0:
            burn_cur_loss /= burn_num_words
            if burn_pre_loss < burn_cur_loss: break        # per-word plateau
            burn_pre_loss, burn_cur_loss, burn_num_words = burn_cur_loss, 0, 0

The reference pays a full host round-trip per sub-iter (SURVEY.md calls this
the hottest loop in the program). Here the whole loop — random batch
selection from the device-resident BucketedPool, forward+backward, clip,
encoder-only SGD step, windowed plateau test — compiles into ONE XLA
while-loop: zero host involvement until it converges.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..data.pool import BucketedPool
from .optim import clip_scale, sgd_update


class InnerCarry(NamedTuple):
    params: dict
    opt_state: dict            # {"enc": ..., "dec": ...}; only enc advances
    key: jax.Array
    sub_iter: jnp.ndarray      # int32
    pre_loss: jnp.ndarray      # float32, best per-word window loss so far
    cur_loss: jnp.ndarray      # float32, accumulated sentence-summed loss
    cur_words: jnp.ndarray     # float32, accumulated predicted-word count
    done: jnp.ndarray          # bool


def make_grad_on(loss_fn: Callable, axis: str | None = None) -> Callable:
    """Shared fwd+bwd closure builder for the outer step and the inner loop.

    Returns ``grad_on(params, key, batch, kl_weight) -> (grads, aux)``.
    With ``axis`` set (data parallelism under shard_map), each shard
    contributes grads of ``local_loss_sum / psum(n_sents)`` and grads/aux are
    ``psum``'d over ICI — reproducing single-device gradients exactly
    (parallel/dp.py semantics note); the per-shard loss key is folded with
    the shard index so dropout/z noise differs across shards.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    if axis is None:
        def grad_on(params, key, batch, kl_weight):
            (_, aux), grads = grad_fn(params, key, batch, kl_weight)
            return grads, aux
        return grad_on

    def grad_on(params, key, batch, kl_weight):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        global_n = jax.lax.psum(batch[-1].sum(), axis)

        def obj(p):
            _, aux = loss_fn(p, key, batch, kl_weight)
            return aux[0] / jnp.maximum(global_n, 1.0), aux

        (_, aux), grads = jax.value_and_grad(obj, has_aux=True)(params)
        grads = jax.lax.psum(grads, axis)
        aux = jax.lax.psum(aux, axis)
        return grads, aux

    return grad_on


def make_aggressive_inner(loss_fn: Callable, pool: BucketedPool,
                          clip_grad: float, burn_max_iters: int,
                          burn_window: int, opt_update: Callable = None,
                          axis: str | None = None,
                          scale_fn: Callable = clip_scale):
    """Build ``inner(params, opt_state, key, kl_weight, lr, arrays=None) ->
    (params, opt_state, sub_iters)``.

    ``loss_fn(params, key, batch_tuple, kl_weight)`` must return
    ``(mean_loss, (loss_sum, rec_sum, kl_sum, n_sents, n_words))`` — the same
    contract used by the outer step, so forward/backward code is shared.
    ``opt_update(params, grads, state, lr, scale=..., finite=...)``
    defaults to plain SGD. Under DP (``axis`` set) the psum'd plateau
    statistics are identical on every shard, so the while_loop condition
    stays replicated. ``scale_fn`` defaults to the dense ``clip_scale``
    (the scalar form of the global-norm clip, folded into the update so no
    scaled-grads pytree is materialized); under vocab TP the caller passes
    ``parallel.tp.clip_scale_tp`` so the norm psums the sharded pred
    gradient's sum-of-squares over the tp axis.
    """
    grad_fn = make_grad_on(loss_fn, axis)
    if opt_update is None:
        def opt_update(p, g, s, lr, scale=None, finite=None):
            p, _ = sgd_update(p, g, lr, scale=scale, finite=finite)
            return p, s

    def inner(params, opt_state, key, kl_weight, lr, arrays=None):
        def cond(c: InnerCarry):
            return jnp.logical_and(~c.done, c.sub_iter < burn_max_iters)

        def body(c: InnerCarry) -> InnerCarry:
            key, k_pick, k_loss = jax.random.split(c.key, 3)
            bucket, idx = pool.sample_coords(k_pick)

            def grad_on(*batch):
                return grad_fn(c.params, k_loss, batch, kl_weight)

            grads, (loss_sum, _, _, _, n_words) = pool.switch(
                bucket, idx, grad_on, arrays=arrays)
            # clip over the FULL tree, apply to the encoder only — as a
            # scalar scale folded into the update (one pass per leaf)
            scale, _, finite = scale_fn(grads, clip_grad)
            enc_new, enc_opt = opt_update(c.params["enc"], grads["enc"],
                                          c.opt_state["enc"], lr,
                                          scale=scale, finite=finite)
            params = dict(c.params, enc=enc_new)
            opt_state = dict(c.opt_state, enc=enc_opt)

            sub_iter = c.sub_iter + 1
            cur_loss = c.cur_loss + loss_sum
            cur_words = c.cur_words + n_words
            check = (sub_iter % burn_window) == 0
            avg = cur_loss / jnp.maximum(cur_words, 1.0)
            done = jnp.logical_and(check, c.pre_loss < avg)
            pre_loss = jnp.where(jnp.logical_and(check, ~done), avg, c.pre_loss)
            cur_loss = jnp.where(check, 0.0, cur_loss)
            cur_words = jnp.where(check, 0.0, cur_words)
            return InnerCarry(params, opt_state, key, sub_iter, pre_loss,
                              cur_loss, cur_words, done)

        init = InnerCarry(params, opt_state, key, jnp.int32(0),
                          jnp.float32(jnp.inf), jnp.float32(0.0),
                          jnp.float32(0.0), jnp.bool_(False))
        out = jax.lax.while_loop(cond, body, init)
        return out.params, out.opt_state, out.sub_iter

    return inner
