"""Tensor parallelism: vocab-sharded output projection + cross-entropy.

The reference is single-device; DP (``parallel/dp.py``) is its direct
scaling story. TP here extends the framework along the model dimension the
flagship actually stresses — the ``[nh, V=20004]`` output projection and
its CE, by far the largest tensor and FLOP block in the text model
(SURVEY.md §6; the single-chip fused CE kernel attacks the same stage).
Sharding ``dec.pred`` column-wise over a ``"tp"`` mesh axis makes vocab
size and its optimizer state scale with the mesh instead of per-chip HBM,
composably with DP on a 2-D ``(dp, tp)`` mesh.

Per-device program (under ``shard_map``):

- Everything up to the decoder's hidden states is REPLICATED across the
  ``tp`` axis (the RNG key is folded with the ``dp`` index only, so all tp
  members draw identical z samples and dropout masks — their h agree
  bit-for-bit and no activation collective is needed on the way in).
- Each tp member computes logits only for its vocab shard
  ``h @ pred_local  [N, V/ntp]`` and the CE's logsumexp is assembled with
  a DISTRIBUTED online-logsumexp: ``pmax`` of the per-shard row maxima,
  ``psum`` of the shifted per-shard exp-sums — the arithmetic mirrors the
  single-chip Pallas kernel's online logsumexp across vocab TILES
  (ops/ce_pallas.py), with mesh members in place of tiles. The target
  logit is contributed by its owner shard and ``psum``'d.
- Loss/grads: every tp member ends with the identical replicated loss, so
  non-pred gradients come out replicated (no extra collective), while
  ``d pred_local`` stays naturally shard-local — exactly the layout its
  SGD update needs. Grad clipping uses the tp-aware GLOBAL norm (the pred
  shard's sum-of-squares is ``psum``'d over tp before the sqrt) so every
  device scales by the same factor; DP grads are ``psum``'d over ``dp``
  and clipped after, matching ``dp.py`` clip-then-step order.

Surfaces: the joint per-step train/eval steps below, AND the fused
whole-epoch program (``train/epoch.py make_train_epoch(tp_axis=...)``,
aggressive inner loop included) — the path ``--tp_devices`` drives from
the text CLI (round 4; previously scoped out). The local
logits here use plain XLA matmuls rather than the fused CE kernel: the
kernel fuses projection+CE to avoid HBM logits, but returns the already-
normalized target logp, which is not decomposable across shards; at
V/ntp-sized shards the [N, V/ntp] local logits are small enough that XLA
is within noise of the kernel (RESULTS.md: the CE fwd is matmul-bound).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.dec_lstm import _dropout
from ..train.optim import scale_from_sumsq, sgd_update


def make_tp_mesh(dp: int, tp: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < dp * tp:
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    return Mesh(np.array(devices[: dp * tp]).reshape(dp, tp), ("dp", "tp"))


def tree_pred_specs(tree, axis: str = "tp"):
    """PartitionSpec pytree for ANY pytree carrying the decoder's output
    projection: every 2-D leaf reached under a ``dec`` key whose final key
    is ``pred`` is sharded ``P(None, axis)`` (vocab columns); everything
    else replicated. Covers both params (``dec.pred``) and optimizer state
    (``dec.{m,v}.pred`` for Adam, ``dec.v.pred`` for momentum-SGD), so the
    fused epoch's carries keep the shard layout end to end."""
    def spec(path, leaf):
        keys = tuple(getattr(p, "key", None) for p in path)
        if ("dec" in keys and keys and keys[-1] == "pred"
                and getattr(leaf, "ndim", 0) == 2):
            return P(None, axis)
        return P()
    return jax.tree_util.tree_map_with_path(spec, tree)


def param_specs(params) -> Tuple:
    """PartitionSpec pytree: ``dec.pred`` sharded on vocab, rest replicated."""
    return tree_pred_specs(params)


def shard_tree(mesh: Mesh, tree, axis: str = "tp"):
    """Place any params/optimizer pytree with its pred leaves vocab-sharded
    over ``axis`` (see ``tree_pred_specs``) and the rest replicated."""
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        tree, tree_pred_specs(tree, axis))


def shard_params(mesh: Mesh, params):
    """Place a replicated params pytree with ``dec.pred`` vocab-sharded."""
    return shard_tree(mesh, params)



@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tp_token_logp(h2d: jnp.ndarray, pred_local: jnp.ndarray,
                  targets: jnp.ndarray, vocab_size: int,
                  axis: str = "tp") -> jnp.ndarray:
    """Per-token target log-probability with the vocab sharded over ``axis``.

    h2d [N, nh] (replicated across the axis), pred_local [nh, V/ntp]
    (this member's column shard), targets [N] global token ids.
    Returns logp [N], identical (replicated) on every axis member.

    The VJP is hand-written (Megatron-style column-parallel boundary):
    ``d logits = ct * (owned_onehot − softmax)``, with ``d h`` psum'd over
    the axis (each member's local matmul carries only its shard's
    contribution) and ``d pred_local`` staying shard-local — the layout its
    sharded optimizer update needs. Writing the collectives into the
    backward explicitly keeps correctness independent of psum transpose
    semantics under ``shard_map(check_vma=False)`` (whose legacy rule,
    transpose(psum)=psum, would scale every crossing gradient by the axis
    size — caught by the parity tests).
    """
    logp, _ = _tp_logp_fwd(h2d, pred_local, targets, vocab_size, axis)
    return logp


def _tp_logp_parts(h2d, pred_local, targets, vocab_size, axis):
    ntp = jax.lax.axis_size(axis)
    v_local = pred_local.shape[1]
    if v_local * ntp != vocab_size:
        raise ValueError(f"vocab {vocab_size} != {ntp} shards x {v_local}")
    lo = jax.lax.axis_index(axis) * v_local

    logits = jnp.dot(h2d, pred_local, preferred_element_type=jnp.float32)
    # distributed online logsumexp (mesh members <-> the single-chip
    # kernel's vocab tiles): pmax of the per-shard row maxima, psum of the
    # shifted per-shard exp-sums
    gmax = jax.lax.pmax(logits.max(axis=-1), axis)
    sumexp = jnp.exp(logits - gmax[:, None]).sum(axis=-1)
    lse = gmax + jnp.log(jax.lax.psum(sumexp, axis))

    # the owner shard contributes the target logit; clip keeps the gather
    # in-bounds on non-owners (their contribution is zeroed)
    t_local = jnp.clip(targets - lo, 0, v_local - 1)
    owned = (targets >= lo) & (targets < lo + v_local)
    tgt = jnp.take_along_axis(logits, t_local[:, None], axis=1)[:, 0]
    tgt = jax.lax.psum(jnp.where(owned, tgt, 0.0), axis)
    return logits, lse, t_local, owned, tgt


def _tp_logp_fwd(h2d, pred_local, targets, vocab_size, axis):
    logits, lse, t_local, owned, tgt = _tp_logp_parts(
        h2d, pred_local, targets, vocab_size, axis)
    return tgt - lse, (h2d, pred_local, logits, lse, t_local, owned)


def _tp_logp_bwd(vocab_size, axis, res, ct):
    h2d, pred_local, logits, lse, t_local, owned = res
    p = jnp.exp(logits - lse[:, None])            # local softmax slice
    onehot = (jax.nn.one_hot(t_local, logits.shape[1], dtype=p.dtype)
              * owned[:, None])
    dlogits = ct[:, None] * (onehot - p)
    dh = jax.lax.psum(
        jnp.dot(dlogits, pred_local.T.astype(dlogits.dtype),
                preferred_element_type=jnp.float32), axis)
    dpred = jnp.dot(h2d.T.astype(dlogits.dtype), dlogits,
                    preferred_element_type=jnp.float32)
    return dh.astype(h2d.dtype), dpred.astype(pred_local.dtype), None


tp_token_logp.defvjp(_tp_logp_fwd, _tp_logp_bwd)


def _tp_loss(vae, params, key, tokens, mask, row_weight, kl_weight,
             nsamples: int, train: bool):
    """Replicated-across-tp per-shard loss; mirrors ``vae.loss`` with the
    decoder's output stage replaced by ``tp_token_logp``. The key splits
    follow ``vae.loss``/``reconstruct_error``/``decode`` exactly so the
    result matches the single-device path to fp tolerance."""
    dec = vae.decoder
    B, T = tokens.shape
    k_enc, k_dec = jax.random.split(key)
    z, kl = vae.encode(params, k_enc, tokens, mask, nsamples)   # [B,K,nz]
    key_in, key_out = (jax.random.split(k_dec) if train else (None, None))

    h = dec._hidden_states(params["dec"], tokens[:, :-1], z, key_in, train)
    if train:
        h = _dropout(key_out, h, dec.dropout_out, train)
    K = z.shape[1]
    tgt = jnp.broadcast_to(tokens[None, :, 1:], (K, B, T - 1)).reshape(-1)
    logp = tp_token_logp(h.reshape(-1, dec.nh).astype(dec.compute_dtype),
                         params["dec"]["pred"].astype(dec.compute_dtype),
                         tgt, dec.vocab_size)
    tok_lp = logp.reshape(K, B, T - 1).transpose(1, 0, 2)
    rec = -jnp.sum(tok_lp * mask[:, None, 1:], axis=-1).mean(axis=1)  # [B]
    rec = rec * row_weight
    kl = kl * row_weight
    loss = rec + kl_weight * kl
    n_sents = row_weight.sum()
    n_words = (mask[:, 1:] * row_weight[:, None]).sum()
    return loss.sum(), (loss.sum(), rec.sum(), kl.sum(), n_sents, n_words)


def tp_reconstruct_error(dec, params_dec, tokens, mask, z,
                         axis: str = "tp") -> jnp.ndarray:
    """-log p(x|z) per (sentence, z-sample) [B, K] with the vocab sharded
    over ``axis`` — the eval-mode (no-dropout) mirror of
    ``LSTMDecoder.reconstruct_error`` with its output stage replaced by
    ``tp_token_logp``: each tp member computes logits only for its vocab
    shard and the per-token logsumexp is assembled distributed, so the
    FLOPs-heaviest stage of evaluation (IW-NLL's [N, V] projections,
    <ref>vae.py §nll_iw) scales over the tp mesh instead of being
    replicated. Matches the dense path to fp tolerance (the logsumexp is
    reassociated across shards); z-sample chunking mirrors ``iw_chunk``.
    """
    B, T = tokens.shape
    K = z.shape[1]

    def rec_chunk(z_chunk):  # [B, k, nz] -> [B, k]
        k = z_chunk.shape[1]
        outs = dec._hidden_states(params_dec, tokens[:, :-1], z_chunk,
                                  None, False)          # [k*B, T-1, nh]
        tgt = jnp.broadcast_to(tokens[None, :, 1:], (k, B, T - 1)).reshape(-1)
        logp = tp_token_logp(
            outs.reshape(-1, dec.nh).astype(dec.compute_dtype),
            params_dec["pred"].astype(dec.compute_dtype), tgt,
            dec.vocab_size, axis)
        tok_lp = logp.reshape(k, B, T - 1).transpose(1, 0, 2)
        return -jnp.sum(tok_lp * mask[:, None, 1:], axis=-1)

    if K <= dec.iw_chunk:
        return rec_chunk(z)
    n_chunks = -(-K // dec.iw_chunk)
    K_pad = n_chunks * dec.iw_chunk
    if K_pad != K:
        z = jnp.concatenate(
            [z, jnp.zeros((B, K_pad - K, dec.nz), z.dtype)], axis=1)
    zc = z.reshape(B, n_chunks, dec.iw_chunk, dec.nz).transpose(1, 0, 2, 3)
    out = jax.lax.map(jax.checkpoint(rec_chunk), zc)    # [n_chunks, B, c]
    return out.transpose(1, 0, 2).reshape(B, K_pad)[:, :K]


def tp_nll_iw(vae, params, key, x, mask=None, nsamples: int = 500,
              ns: int = 100, axis: str = "tp") -> jnp.ndarray:
    """Vocab-sharded importance-weighted NLL per sentence [B] — the tp
    twin of ``VAE.nll_iw`` (<ref>vae.py §nll_iw): identical fold_in key
    structure (so the z draws match the dense estimator sample-for-sample;
    the encoder runs replicated across tp), with the decoder likelihood
    computed by ``tp_reconstruct_error``. Must run under a shard_map
    carrying ``axis``."""
    import math as _math

    from ..models.encoder import eval_inference_dist as _eid

    ns = min(ns, nsamples)
    assert nsamples % ns == 0, (nsamples, ns)
    n_chunks = nsamples // ns

    def chunk_log_w(i):
        k_i = jax.random.fold_in(key, i)
        z, (mu, logvar) = vae.encoder.sample(params["enc"], k_i, x, mask, ns)
        log_pxz = -tp_reconstruct_error(vae.decoder, params["dec"], x, mask,
                                        z, axis)
        return vae.eval_prior_dist(z) + log_pxz - _eid(z, mu, logvar)

    if n_chunks == 1:
        log_w = chunk_log_w(0)
    else:
        stacked = jax.lax.map(chunk_log_w, jnp.arange(n_chunks))
        log_w = jnp.moveaxis(stacked, 0, 1).reshape(x.shape[0], nsamples)
    return -(jax.nn.logsumexp(log_w, axis=1) - _math.log(nsamples))


def make_tp_loss_fn(vae, nsamples: int = 1, train: bool = True) -> Callable:
    """``train/epoch.py make_loss_fn``-contract adapter over ``_tp_loss``:
    (params, key, (tokens, mask, row_weight), kl_weight) -> (mean_loss,
    (loss_sum, rec_sum, kl_sum, n_sents, n_words)), with the decoder's
    output stage vocab-sharded over the ``tp`` axis. Must run under a
    shard_map that carries that axis; plugs into the fused whole-epoch
    program and the aggressive inner loop unchanged (their DP psum happens
    in make_grad_on, exactly like the dense loss)."""
    def loss_fn(params, key, batch, kl_weight):
        tokens, mask, row_weight = batch
        loss_sum, aux = _tp_loss(vae, params, key, tokens, mask, row_weight,
                                 kl_weight, nsamples, train)
        return loss_sum / jnp.maximum(aux[3], 1.0), aux
    return loss_fn


def clip_scale_tp(grads, max_norm: float, axis: str = "tp"):
    """Scalar form of ``clip_tp`` (mirrors ``optim.clip_scale``): returns
    ``(scale, norm, finite)`` with ``dec.pred``'s sum-of-squares psum'd over
    ``axis``, for folding the clip into the optimizer update without
    materializing a scaled pytree."""
    pred = grads["dec"]["pred"]
    rest = {**grads, "dec": {k: v for k, v in grads["dec"].items()
                             if k != "pred"}}
    sumsq = sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(rest))
    sumsq = sumsq + jax.lax.psum(jnp.sum(jnp.square(pred)), axis)
    return scale_from_sumsq(sumsq, max_norm)


def clip_tp(grads, max_norm: float, axis: str = "tp"):
    """Global-norm clip where ``dec.pred`` is sharded over ``axis``: its
    sum-of-squares is psum'd so all devices see the same norm and scale.
    Same formula AND non-finite guard as ``optim.clip_by_global_norm``
    (an overflowing batch zeroes the step instead of NaN-poisoning params
    via 0*inf), so tp=1 reproduces the DP step exactly — including on the
    overflow branch."""
    scale, norm, finite = clip_scale_tp(grads, max_norm, axis)
    return jax.tree.map(
        lambda g: jnp.where(finite, g * scale, 0.0), grads), norm


def make_tp_train_step(vae, cfg, mesh: Mesh) -> Callable:
    """Jitted DP x TP training step (joint enc+dec SGD update).

    step(params, key, tokens [B,T], mask, row_weight, kl_weight, lr)
        -> (params, (loss_sum, rec_sum, kl_sum, n_sents, n_words))

    params: replicated except ``dec.pred`` sharded ``P(None, "tp")`` (use
    ``shard_params``); batch sharded over ``dp``; aux sums are global.
    With tp=1 this reproduces ``make_dp_train_step`` exactly (tested); the
    vocab must divide by the tp size.
    """
    def shard_step(params, key, tokens, mask, row_weight, kl_weight, lr):
        # fold the dp index ONLY: tp members must stay replicated so their
        # hidden states (z noise, dropout masks) agree without collectives
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))

        def local_objective(p):
            loss_sum, aux = _tp_loss(vae, p, key, tokens, mask, row_weight,
                                     kl_weight, cfg.nsamples, train=True)
            global_n = jax.lax.psum(aux[3], "dp")
            return loss_sum / jnp.maximum(global_n, 1.0), aux

        (_, aux), grads = jax.value_and_grad(local_objective,
                                             has_aux=True)(params)
        grads = jax.lax.psum(grads, "dp")   # pred grad stays tp-local
        aux = jax.lax.psum(aux, "dp")
        grads, _ = clip_tp(grads, cfg.clip_grad)
        params, _ = sgd_update(params, grads, lr)
        return params, aux

    # specs depend only on the params' tree structure; build them from the
    # real pytree at first call and reuse the jitted program after
    cache = {}

    def step(params, *args):
        if "fn" not in cache:
            pspecs = param_specs(params)
            cache["fn"] = jax.jit(jax.shard_map(
                shard_step, mesh=mesh,
                in_specs=(pspecs, P(), P("dp"), P("dp"), P("dp"), P(), P()),
                out_specs=(pspecs, P()),
                check_vma=False), donate_argnums=(0,))
        return cache["fn"](params, *args)

    return step


def make_tp_eval_step(vae, mesh: Mesh, nsamples: int = 1) -> Callable:
    """Jitted DP x TP ELBO eval: (params, key, tokens, mask, row_weight,
    kl_weight) -> global (loss_sum, rec_sum, kl_sum, n_sents, n_words)."""
    def shard_eval(params, key, tokens, mask, row_weight, kl_weight):
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        _, aux = _tp_loss(vae, params, key, tokens, mask, row_weight,
                          kl_weight, nsamples, train=False)
        return jax.lax.psum(aux, "dp")

    cache = {}

    def _run(params, *args):
        if "fn" not in cache:
            pspecs = param_specs(params)
            cache["fn"] = jax.jit(jax.shard_map(
                shard_eval, mesh=mesh,
                in_specs=(pspecs, P(), P("dp"), P("dp"), P("dp"), P()),
                out_specs=P(), check_vma=False))
        return cache["fn"](params, *args)

    return _run
