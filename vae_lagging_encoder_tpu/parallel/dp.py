"""Data parallelism over the ICI mesh.

The reference is strictly single-device (SURVEY.md §2 parallelism table:
no DataParallel/torch.distributed anywhere); DP is the one parallelism the
TPU rebuild adds (BASELINE.json north star): shard the batch over a
``jax.sharding.Mesh`` axis ``"dp"``, compute per-shard grads under
``shard_map``, and ``psum`` them over ICI. At v5e-8 scale the grad
all-reduce rides ICI; DCN is irrelevant.

Semantics note: the reference's objective is the *batch mean* of
per-sentence loss. With possibly-unequal real-row counts per shard (pad
rows), the correct global objective is ``psum(loss_sum) / psum(n_sents)``;
each shard therefore contributes grads of ``loss_sum / global_n`` and grads
are ``psum``'d (not pmean'd), which reproduces single-device gradients
bit-for-bit in exact arithmetic (tests/test_parallel.py checks this).
Clipping happens after the all-reduce, on the identical replicated grads —
matching the reference's clip-then-step order.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.optim import clip_by_global_norm, sgd_update


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("dp",))


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays with batch-dim sharding over the ``dp`` axis."""
    sharding = NamedSharding(mesh, P("dp"))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def make_dp_train_step(vae, cfg, mesh: Mesh) -> Callable:
    """Jitted DP training step: joint enc+dec update on a global batch.

    step(params, key, tokens [B,T], mask, row_weight, kl_weight, lr)
        -> (params, (loss_sum, rec_sum, kl_sum, n_sents, n_words))
    Global batch B must divide by mesh size; params replicated, batch
    sharded on dim 0, gradients psum'd over ICI.
    """
    from ..train.epoch import make_loss_fn  # local import to avoid cycle

    loss_fn = make_loss_fn(vae, nsamples=cfg.nsamples, train=True)

    def shard_step(params, key, tokens, mask, row_weight, kl_weight, lr):
        # identical key per shard is fine: shards see different data; fold in
        # the shard index so dropout/z noise differs across shards.
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))

        def local_objective(p):
            _, (loss_sum, rec_s, kl_s, n_sents, n_words) = loss_fn(
                p, key, (tokens, mask, row_weight), kl_weight)
            global_n = jax.lax.psum(n_sents, "dp")
            obj = loss_sum / jnp.maximum(global_n, 1.0)
            return obj, (loss_sum, rec_s, kl_s, n_sents, n_words)

        (_, aux), grads = jax.value_and_grad(local_objective, has_aux=True)(params)
        grads = jax.lax.psum(grads, "dp")       # ICI all-reduce
        aux = jax.lax.psum(aux, "dp")
        grads, _ = clip_by_global_norm(grads, cfg.clip_grad)
        params, _ = sgd_update(params, grads, lr)
        return params, aux

    mapped = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp"), P("dp"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))
