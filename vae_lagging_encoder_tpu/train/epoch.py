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
from .aggressive import make_aggressive_inner, make_grad_on
from .optim import clip_scale, make_optimizer


def make_loss_fn(vae: VAE, nsamples: int = 1, train: bool = True) -> Callable:
    """Text loss adapter: (params, key, batch, kl_weight) ->
    (mean_loss, (loss_sum, rec_sum, kl_sum, n_sents, n_words)) where
    ``batch = (tokens, mask, row_weight)`` as yielded by BucketedPool.

    mean_loss is the reference's ``loss.mean()`` objective (per real
    sentence); the aux sums feed epoch-level reporting.
    """

    def loss_fn(params, key, batch, kl_weight):
        tokens, mask, row_weight = batch
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


def make_image_loss_fn(vae: VAE, nsamples: int = 1, train: bool = True) -> Callable:
    """Image loss adapter: batch = (probs, row_weight); binarizes on device
    (fresh Bernoulli draw per step — parity with <ref>image.py §dynamic
    binarization, SURVEY.md §3.4). 'words' are pixels for per-unit stats."""

    def loss_fn(params, key, batch, kl_weight):
        probs, row_weight = batch
        k_bin, k_loss = jax.random.split(key)
        x = jax.random.bernoulli(k_bin, probs).astype(jnp.float32)
        loss, rec, kl = vae.loss(params, k_loss, x, None, row_weight,
                                 kl_weight=kl_weight, nsamples=nsamples,
                                 train=train)
        n = row_weight.sum()
        n_pixels = n * float(np.prod(probs.shape[1:]))
        loss_sum = loss.sum()
        return loss_sum / jnp.maximum(n, 1.0), (
            loss_sum, rec.sum(), kl.sum(), n, n_pixels)

    return loss_fn


def binarize_prep(key, batch):
    """Eval-time prep for image batches: fresh dynamic binarization
    (the reference binarizes at eval too — SURVEY.md §3.4)."""
    probs, row_weight = batch
    x = jax.random.bernoulli(key, probs).astype(jnp.float32)
    return x, None, row_weight


def make_train_epoch(vae: VAE, pool: BucketedPool, cfg,
                     loss_fn: Callable | None = None, mesh=None,
                     axis: str = "dp", tp_axis: str | None = None):
    """Build ``(epoch_fn, opt_init)`` where
    ``epoch_fn(params, opt_state, key, kl_weight, lr, order, aggressive) ->
    (params, opt_state, kl_weight, stats, total_inner_iters)``.

    ``opt_state`` is ``{"enc": ..., "dec": ...}`` — two separate optimizers
    exactly like the reference (<ref>text.py §main); the aggressive inner
    loop advances only the encoder's. ``order`` is a host-shuffled
    permutation of flat batch indices; ``aggressive`` is a static bool (the
    flag flips at most once per run, costing one recompile when the MI
    plateau switches it off permanently).

    With ``mesh`` set, the WHOLE epoch program (inner loop included) runs
    under ``shard_map``: the pool must be batch-sharded over ``axis``
    (``pool.shard(mesh)``), params/optimizer state are replicated, and every
    gradient — outer and inner — is ``psum``'d over ICI (make_grad_on).

    With ``tp_axis`` also set (a 2-D ``(dp, tp)`` mesh from
    ``parallel.make_tp_mesh``), the decoder's output projection and its CE
    are vocab-sharded over that axis (parallel/tp.py): the loss defaults to
    ``make_tp_loss_fn``, grad clipping uses the tp-aware global norm, and
    params/optimizer-state specs keep ``dec.pred`` (and its moments)
    ``P(None, tp_axis)`` through the whole fused-epoch carry.
    """
    dp_axis = axis if mesh is not None else None
    if tp_axis is not None:
        if mesh is None:
            raise ValueError("tp_axis requires a (dp, tp) mesh")
        if loss_fn is not None:
            # a dense loss under vocab-sharded in_specs would compute
            # logits over only V/tp columns against GLOBAL token ids —
            # silently wrong math, so refuse rather than accept
            raise ValueError(
                "tp_axis builds its own vocab-sharded loss "
                "(parallel.tp.make_tp_loss_fn); a caller-supplied loss_fn "
                "cannot be sharded for it — pass loss_fn=None")
        from ..parallel.tp import (clip_scale_tp, make_tp_loss_fn,
                                   tree_pred_specs)

        loss_fn = make_tp_loss_fn(vae, nsamples=cfg.nsamples, train=True)
        scale_fn = partial(clip_scale_tp, axis=tp_axis)
    else:
        loss_fn = loss_fn or make_loss_fn(vae, nsamples=cfg.nsamples,
                                          train=True)
        scale_fn = clip_scale
    grad_fn = make_grad_on(loss_fn, dp_axis)
    opt_init_part, opt_update = make_optimizer(
        getattr(cfg, "optim", "sgd"), momentum=cfg.momentum)

    def opt_init(params):
        return {"enc": opt_init_part(params["enc"]),
                "dec": opt_init_part(params["dec"])}

    inner = make_aggressive_inner(loss_fn, pool, cfg.clip_grad,
                                  cfg.burn_max_iters, cfg.burn_window,
                                  opt_update=opt_update, axis=dp_axis,
                                  scale_fn=scale_fn)
    flat_bucket, flat_idx = _flat_coords(pool)
    flat_bucket = jnp.asarray(flat_bucket)
    flat_idx = jnp.asarray(flat_idx)
    loop_unroll = int(getattr(cfg, "loop_unroll", 1) or 1)
    # warm_up <= 0 is valid only with kl_start 1.0 (no annealing; run_training
    # rejects the contradictory combination up front)
    anneal_rate = ((1.0 - cfg.kl_start) / (cfg.warm_up * pool.num_batches)
                   if cfg.warm_up > 0 else 0.0)

    arr_leaves = pool.flat_leaves()

    def epoch_core(params, opt_state, key, kl_weight, lr, order,
                   *arr_flat, aggressive: bool):
        local_arrays = pool.rebuild(list(arr_flat)) if arr_flat else None

        def body(i, state):
            params, opt_state, key, kl_weight, sums, inner_iters = state
            key, k_inner, k_loss = jax.random.split(key, 3)
            flat = order[i]
            bucket, idx = flat_bucket[flat], flat_idx[flat]

            # <ref>text.py anneals kl_weight at the TOP of each batch
            # iteration, before the encoder burn loop, so the inner updates
            # run at this step's (already-annealed) weight.
            kl_weight = jnp.minimum(1.0, kl_weight + anneal_rate)

            if aggressive:
                # <ref>text.py §3.2: encoder-only sub-updates to plateau,
                # BEFORE this step's decoder update, at the current kl_weight.
                params, opt_state, n_sub = inner(params, opt_state, k_inner,
                                                 kl_weight, lr,
                                                 arrays=local_arrays)
                inner_iters = inner_iters + n_sub

            def grad_on(*batch):
                return grad_fn(params, k_loss, batch, kl_weight)

            grads, aux = pool.switch(bucket, idx, grad_on,
                                     arrays=local_arrays)
            # clip folded into the update as a scalar (clip_scale): each
            # param/grad leaf is read once and written once — no scaled
            # pytree between two sweeps (VERDICT r4 weak #1)
            scale, _, finite = scale_fn(grads, cfg.clip_grad)
            if aggressive:
                # decoder-only step while the aggressive flag is on
                dec_new, dec_opt = opt_update(params["dec"], grads["dec"],
                                              opt_state["dec"], lr,
                                              scale=scale, finite=finite)
                params = dict(params, dec=dec_new)
                opt_state = dict(opt_state, dec=dec_opt)
            else:
                enc_new, enc_opt = opt_update(params["enc"], grads["enc"],
                                              opt_state["enc"], lr,
                                              scale=scale, finite=finite)
                dec_new, dec_opt = opt_update(params["dec"], grads["dec"],
                                              opt_state["dec"], lr,
                                              scale=scale, finite=finite)
                params = {"enc": enc_new, "dec": dec_new}
                opt_state = {"enc": enc_opt, "dec": dec_opt}
            sums = jax.tree.map(jnp.add, sums, aux)
            return params, opt_state, key, kl_weight, sums, inner_iters

        zeros = tuple(jnp.float32(0.0) for _ in range(5))
        # bound = the order array's length, so the host can run an epoch in
        # SEGMENTS (bounded single-dispatch runtime: the tunneled worker
        # kills executions that run unattended for many minutes, and it
        # restores reference-style intra-epoch logging).
        # unroll: static bounds lower this to lax.scan, where unroll>1 puts
        # several steps in one loop body — fewer carry-boundary crossings
        # for the ~54 MB param carry (the profile dossier's 15% copy/DMA
        # bucket). Plain path only: the aggressive body embeds the inner
        # while_loop, whose duplicated program is not worth the compile.
        unroll = 1 if aggressive else max(1, loop_unroll)
        params, opt_state, _, kl_weight, sums, inner_iters = jax.lax.fori_loop(
            0, order.shape[0], body,
            (params, opt_state, key, kl_weight, zeros, jnp.int32(0)),
            unroll=unroll)
        return params, opt_state, kl_weight, sums, inner_iters

    if mesh is None:
        @partial(jax.jit, static_argnames=("aggressive",),
                 donate_argnums=(0, 1))
        def epoch_fn(params, opt_state, key, kl_weight, lr, order,
                     aggressive: bool = False):
            return epoch_core(params, opt_state, key, kl_weight, lr, order,
                              aggressive=aggressive)
    else:
        from jax.sharding import PartitionSpec as P

        spec_leaves = [s for specs in pool.batch_specs(axis) for s in specs]
        # params/opt_state specs depend only on the pytrees' structure;
        # build them from the real trees at first call (same cache pattern
        # as parallel/tp.py) — replicated P() unless tp_axis shards pred.
        cache = {}

        def _jitted(params, opt_state):
            if "fn" not in cache:
                if tp_axis is None:
                    pspec, ospec = P(), P()
                else:
                    pspec = tree_pred_specs(params, tp_axis)
                    ospec = tree_pred_specs(opt_state, tp_axis)

                @partial(jax.jit, static_argnames=("aggressive",),
                         donate_argnums=(0, 1))
                def jitted(params, opt_state, key, kl_weight, lr, order,
                           aggressive: bool = False):
                    fn = jax.shard_map(
                        partial(epoch_core, aggressive=aggressive), mesh=mesh,
                        in_specs=(pspec, ospec, P(), P(), P(), P(),
                                  *spec_leaves),
                        out_specs=(pspec, ospec, P(), P(), P()),
                        check_vma=False)
                    return fn(params, opt_state, key, kl_weight, lr, order,
                              *arr_leaves)

                cache["fn"] = jitted
            return cache["fn"]

        def epoch_fn(params, opt_state, key, kl_weight, lr, order,
                     aggressive: bool = False):
            return _jitted(params, opt_state)(
                params, opt_state, key, kl_weight, lr, order,
                aggressive=aggressive)

        # compile-only entry (tests/test_flagship_compile): specs derive
        # from .ndim, so ShapeDtypeStruct trees work here too
        def _lower(params, opt_state, *args, aggressive: bool = False):
            return _jitted(params, opt_state).lower(
                params, opt_state, *args, aggressive=aggressive)

        epoch_fn.lower = _lower

    return epoch_fn, opt_init


def make_pool_reducer(pool: BucketedPool, batch_fn: Callable, init,
                      mesh=None, axis: str = "dp",
                      segment: int | None = None,
                      tp_axis: str | None = None) -> Callable:
    """Build ``reduce_fn(params, key) -> summed pytree`` where
    ``batch_fn(params, key, batch_tuple)`` returns a pytree of scalars added
    across every batch in the pool (one fused XLA program).

    With ``mesh`` set the reduction is data-parallel over BATCHES
    (SURVEY.md §7 step 7 "eval sharded likewise"): device d computes whole
    batches [d*ceil(n/D), ...) with the same ``fold_in(key, i)`` per-batch
    keys as the unsharded path — so every per-batch value (including the
    batch-mixture MI estimator, whose O(B²) pairwise term must see the whole
    batch) is IDENTICAL to the single-device result, and only the final psum
    changes summation order. The pool stays replicated (eval sets are small);
    there is zero communication until the one closing psum over ICI.

    With ``tp_axis`` also set (a 2-D ``(dp, tp)`` mesh), the params' vocab-
    sharded ``dec.pred`` leaves keep their ``P(None, tp_axis)`` layout into
    the program — ``batch_fn`` must then be tp-aware (its per-batch values
    replicated across the tp axis, e.g. via ``tp_token_logp``'s internal
    collectives), and each dp group's tp members SHARE the vocab dimension
    of the work instead of replicating it (VERDICT r4 weak #4).
    """
    flat_bucket, flat_idx = map(jnp.asarray, _flat_coords(pool))
    n = pool.num_batches

    if mesh is None:
        @jax.jit
        def reduce_seg(params, key, start, stop):
            def body(i, acc):
                k_i = jax.random.fold_in(key, i)

                def on(*batch):
                    return batch_fn(params, k_i, batch)

                out = pool.switch(flat_bucket[i], flat_idx[i], on)
                return jax.tree.map(jnp.add, acc, out)

            return jax.lax.fori_loop(start, stop, body, init)

        if segment is None:
            return lambda params, key: reduce_seg(params, key, 0, n)

        # Segmented dispatches: the tunneled TPU worker kills single
        # executions that run unattended past ~1 min, and a whole-pool
        # 500-sample IW reduction over a 5k-sentence eval set is one ~86 s
        # program (observed crash at the 100k-corpus study's final suite).
        # Per-batch keys are fold_in(key, i) either way, so segmentation
        # only regroups the final summation order.
        def reduce_fn(params, key):
            acc = init
            for s in range(0, n, segment):
                out = reduce_seg(params, key, s, min(s + segment, n))
                acc = jax.tree.map(jnp.add, acc, out)
            return acc

        return reduce_fn

    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    per = -(-n // n_dev)
    arr_leaves = pool.flat_leaves()

    def reduce_core(params, key, start, stop, *arr_flat):
        local_arrays = pool.rebuild(list(arr_flat))
        d = jax.lax.axis_index(axis)

        def body(j, acc):
            i = d * per + j
            valid = i < n
            i_c = jnp.minimum(i, n - 1)
            k_i = jax.random.fold_in(key, i_c)

            def on(*batch):
                return batch_fn(params, k_i, batch)

            out = pool.switch(flat_bucket[i_c], flat_idx[i_c], on,
                              arrays=local_arrays)
            out = jax.tree.map(
                lambda x: jnp.where(valid, x, jnp.zeros_like(x)), out)
            return jax.tree.map(jnp.add, acc, out)

        acc = jax.lax.fori_loop(start, stop, body, init)
        return jax.lax.psum(acc, axis)

    # the params spec depends on the pytree's structure (vocab-sharded
    # dec.pred under tp), so build it from the real tree at first call —
    # same cache pattern as make_train_epoch's mesh branch
    cache = {}

    def reduce_seg(params, key, start, stop):
        if "fn" not in cache:
            if tp_axis is None:
                pspec = P()
            else:
                from ..parallel.tp import tree_pred_specs
                pspec = tree_pred_specs(params, tp_axis)
            cache["fn"] = jax.jit(jax.shard_map(
                reduce_core, mesh=mesh,
                in_specs=(pspec, P(), P(), P(), *([P()] * len(arr_leaves))),
                out_specs=P(), check_vma=False))
        return cache["fn"](params, key, start, stop, *arr_leaves)

    if segment is None:
        return lambda params, key: reduce_seg(params, key, 0, per)

    # Segmented dispatches, same reason as the single-device branch above
    # (the tunneled worker kills long unattended executions — at dp=1 with
    # a tp-only mesh every device would otherwise loop the WHOLE pool in
    # one program, exactly the ~86 s IW crash case). Segments bound the
    # PER-DEVICE loop [0, per); per-batch fold_in keys are unchanged, so
    # only the final host-side summation order regroups.
    def reduce_fn(params, key):
        acc = init
        for s in range(0, per, segment):
            out = reduce_seg(params, key, s, min(s + segment, per))
            acc = jax.tree.map(jnp.add, acc, out)
        return acc

    return reduce_fn


# ---------------------------------------------------------------------------
# Evaluation suites over a pool (parity: <ref>text.py §test/§calc_mi/
# §calc_au/§calc_iwnll — SURVEY.md §3.3), each as ONE fused device program.
# All are modality-generic: a pool batch is either (tokens, mask, row_weight)
# for text or (x, row_weight) for images (mask None, "words" = pixels).

def _unpack(key, batch):
    """Default eval prep: identity for text; image pools should pass
    ``prep=binarize_prep`` so estimators see fresh binarized samples."""
    del key
    if len(batch) == 3:
        x, mask, row_weight = batch
        return x, mask, row_weight
    x, row_weight = batch
    return x, None, row_weight


def _unit_count(x, mask, row_weight):
    if mask is not None:
        return (mask[:, 1:] * row_weight[:, None]).sum()
    per_item = float(np.prod(x.shape[1:]))
    return row_weight.sum() * per_item


def _safe_exp(x: float) -> float:
    try:
        return math.exp(x)
    except OverflowError:
        return float("inf")


def make_eval_fn(vae: VAE, pool: BucketedPool, nsamples: int = 1,
                 loss_fn: Callable | None = None, mesh=None,
                 tp_axis: str | None = None) -> Callable:
    """ELBO evaluation: returns dict(loss, rec, kl per item; ppl).

    With ``tp_axis`` (vocab-sharded ``dec.pred`` on a (dp, tp) mesh) the
    loss is the vocab-sharded ``make_tp_loss_fn`` and params stay sharded
    — no all-gather per eval (VERDICT r4 weak #4)."""
    if tp_axis is not None:
        if loss_fn is not None:
            raise ValueError("tp_axis builds its own vocab-sharded eval "
                             "loss; pass loss_fn=None")
        from ..parallel.tp import make_tp_loss_fn
        loss_fn = make_tp_loss_fn(vae, nsamples=nsamples, train=False)
    else:
        loss_fn = loss_fn or make_loss_fn(vae, nsamples=nsamples, train=False)

    def batch_fn(params, key, batch):
        _, sums = loss_fn(params, key, batch, 1.0)
        return sums

    init = tuple(jnp.float32(0.0) for _ in range(5))
    reducer = make_pool_reducer(pool, batch_fn, init, mesh=mesh,
                                tp_axis=tp_axis)

    def eval_fn(params, key):
        loss_s, rec_s, kl_s, n_sent, n_words = map(
            float, jax.device_get(reducer(params, key)))
        return {
            "loss": loss_s / n_sent, "rec": rec_s / n_sent, "kl": kl_s / n_sent,
            "nll": (rec_s + kl_s) / n_sent,
            "ppl": _safe_exp((rec_s + kl_s) / n_words),
            "n_sents": n_sent, "n_words": n_words,
        }

    return eval_fn


def make_mi_fn(vae: VAE, pool: BucketedPool, prep: Callable = _unpack,
               mesh=None, tp_axis: str | None = None) -> Callable:
    """Corpus MI: batch-size-weighted mean of per-batch MI estimates
    (parity: <ref>text.py §calc_mi). MI is encoder-only; ``tp_axis`` just
    keeps the vocab-sharded params layout (the pred shard is never read)."""

    def batch_fn(params, key, batch):
        k_prep, key = jax.random.split(key)
        x, mask, row_weight = prep(k_prep, batch)
        mi = vae.calc_mi_q(params, key, x, mask, row_weight)
        n = row_weight.sum()
        return (mi * n, n)

    reducer = make_pool_reducer(pool, batch_fn,
                                (jnp.float32(0.0), jnp.float32(0.0)),
                                mesh=mesh, tp_axis=tp_axis)

    def mi_fn(params, key):
        mi_sum, n = jax.device_get(reducer(params, key))
        return float(mi_sum / max(n, 1.0))

    return mi_fn


def make_au_fn(vae: VAE, pool: BucketedPool, delta: float = 0.01,
               prep: Callable = _unpack, mesh=None,
               tp_axis: str | None = None) -> Callable:
    """Active units: #dims with Var_x[mu(x)] > delta — two fused passes
    (parity: <ref>text.py §calc_au). Encoder-only; ``tp_axis`` keeps the
    vocab-sharded params layout."""
    nz = vae.nz

    def mean_batch(params, key, batch):
        x, mask, row_weight = prep(key, batch)
        mu = vae.calc_infer_mean(params, x, mask)
        return (jnp.sum(mu * row_weight[:, None], axis=0), row_weight.sum())

    mean_reducer = make_pool_reducer(
        pool, mean_batch, (jnp.zeros((nz,)), jnp.float32(0.0)), mesh=mesh,
        tp_axis=tp_axis)

    # mu_mean rides inside the reducer's opaque params pytree so this
    # reducer compiles ONCE — rebuilding it per au_fn call re-jitted the
    # whole pool-reduction program (a multi-second trace+compile) on every
    # AU evaluation and baked mu_mean in as a constant (code-review r3)
    def var_batch(carry, key, batch):
        params, mu_mean = carry
        x, mask, row_weight = prep(key, batch)
        mu = vae.calc_infer_mean(params, x, mask)
        dev = (mu - mu_mean) ** 2 * row_weight[:, None]
        return (jnp.sum(dev, axis=0),)

    var_reducer = make_pool_reducer(pool, var_batch, (jnp.zeros((nz,)),),
                                    mesh=mesh, tp_axis=tp_axis)

    def au_fn(params, key):
        mu_sum, n = mean_reducer(params, key)
        mu_mean = mu_sum / jnp.maximum(n, 1.0)
        (var_sum,) = var_reducer((params, mu_mean), key)
        var = jax.device_get(var_sum) / max(float(jax.device_get(n)) - 1.0, 1.0)
        return int((var > delta).sum()), var

    return au_fn


def make_iwnll_fn(vae: VAE, pool: BucketedPool, nsamples: int = 500,
                  ns: int = 100, prep: Callable = _unpack,
                  mesh=None, segment: int | None = None,
                  tp_axis: str | None = None) -> Callable:
    """500-sample importance-weighted NLL + PPL over a pool
    (parity: <ref>text.py §calc_iwnll → <ref>vae.py §nll_iw). The most
    FLOPs-heavy path in the repo (SURVEY.md §3.3); with ``mesh`` it
    parallelizes over batches with zero communication until the final psum.
    With ``tp_axis`` the decoder likelihood inside the estimator is
    vocab-sharded (``parallel.tp.tp_nll_iw``), so the [N, V] projections —
    where the IW FLOPs live — scale over the tp mesh too."""
    if tp_axis is not None:
        from ..parallel.tp import tp_nll_iw

        def nll_fn(params, key, x, mask):
            return tp_nll_iw(vae, params, key, x, mask, nsamples=nsamples,
                             ns=ns, axis=tp_axis)
    else:
        def nll_fn(params, key, x, mask):
            return vae.nll_iw(params, key, x, mask, nsamples=nsamples, ns=ns)

    def batch_fn(params, key, batch):
        k_prep, key = jax.random.split(key)
        x, mask, row_weight = prep(k_prep, batch)
        nll = nll_fn(params, key, x, mask)
        return ((nll * row_weight).sum(), row_weight.sum(),
                _unit_count(x, mask, row_weight))

    reducer = make_pool_reducer(
        pool, batch_fn, tuple(jnp.float32(0.0) for _ in range(3)), mesh=mesh,
        segment=segment, tp_axis=tp_axis)

    def iwnll_fn(params, key):
        nll_sum, n_sent, n_words = map(float, jax.device_get(reducer(params, key)))
        return {"nll": nll_sum / n_sent, "ppl": _safe_exp(nll_sum / n_words),
                "n_sents": n_sent, "n_words": n_words}

    return iwnll_fn
