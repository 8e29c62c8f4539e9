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
from .optim import clip_by_global_norm, sgd_update


class InnerCarry(NamedTuple):
    params: dict
    opt_state: dict            # {"enc": ..., "dec": ...}; only enc advances
    key: jax.Array
    sub_iter: jnp.ndarray      # int32
    pre_loss: jnp.ndarray      # float32, best per-word window loss so far
    cur_loss: jnp.ndarray      # float32, accumulated sentence-summed loss
    cur_words: jnp.ndarray     # float32, accumulated predicted-word count
    done: jnp.ndarray          # bool


def make_aggressive_inner(loss_fn: Callable, pool: BucketedPool,
                          clip_grad: float, burn_max_iters: int,
                          burn_window: int, opt_update: Callable = None):
    """Build ``inner(params, opt_state, key, kl_weight, lr) ->
    (params, opt_state, sub_iters)``.

    ``loss_fn(params, key, batch_tuple, kl_weight)`` must return
    ``(mean_loss, (loss_sum, rec_sum, kl_sum, n_sents, n_words))`` — the same
    contract used by the outer step, so forward/backward code is shared.
    ``opt_update(params, grads, state, lr)`` defaults to plain SGD.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    if opt_update is None:
        def opt_update(p, g, s, lr):
            p, _ = sgd_update(p, g, lr)
            return p, s

    def inner(params, opt_state, key, kl_weight, lr):
        def cond(c: InnerCarry):
            return jnp.logical_and(~c.done, c.sub_iter < burn_max_iters)

        def body(c: InnerCarry) -> InnerCarry:
            key, k_pick, k_loss = jax.random.split(c.key, 3)
            bucket, idx = pool.sample_coords(k_pick)

            def grad_on(*batch):
                (_, aux), grads = grad_fn(c.params, k_loss, batch, kl_weight)
                return grads, aux

            grads, (loss_sum, _, _, _, n_words) = pool.switch(bucket, idx, grad_on)
            # clip over the FULL tree, apply to the encoder only
            grads, _ = clip_by_global_norm(grads, clip_grad)
            enc_new, enc_opt = opt_update(c.params["enc"], grads["enc"],
                                          c.opt_state["enc"], lr)
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
