"""Tensor-parallel (vocab-sharded output stage) tests on the CPU mesh.

parallel/tp.py shards ``dec.pred`` + its CE over a ``tp`` mesh axis with a
distributed online logsumexp and a hand-written column-parallel VJP. The
oracle for everything here is the single-device math the rest of the suite
already trusts; the grad checks are load-bearing — the legacy
``shard_map(check_vma=False)`` psum transpose would silently scale
gradients by the tp size (measured 4x on a probe) without the custom VJP.
"""
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_lagging_encoder_tpu.models import (VAE, GaussianLSTMEncoder,
                                            LSTMDecoder)
from vae_lagging_encoder_tpu.parallel import (make_dp_train_step, make_mesh,
                                              make_tp_eval_step, make_tp_mesh,
                                              make_tp_train_step, shard_batch,
                                              shard_params, tp_token_logp)
from vae_lagging_encoder_tpu.train.epoch import make_loss_fn
from vae_lagging_encoder_tpu.train.optim import (clip_by_global_norm,
                                                 sgd_update)

V, NI, NH, NZ, B, T = 48, 8, 12, 3, 8, 10
CFG = SimpleNamespace(nsamples=1, clip_grad=5.0)


def _setup(dropout=0.5, seed=0):
    enc = GaussianLSTMEncoder(V, NI, NH, NZ)
    dec = LSTMDecoder(V, NI, NH, NZ, dropout_in=dropout, dropout_out=dropout)
    vae = VAE(enc, dec)
    params = vae.init(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    tokens = jnp.asarray(rng.randint(0, V, (B, T)), jnp.int32)
    mask = jnp.asarray((np.arange(T)[None] < rng.randint(4, T + 1, (B, 1)))
                       .astype(np.float32))
    rw = jnp.ones((B,), jnp.float32)
    return vae, params, tokens, mask, rw


def _single_device_step(vae, params, key_folded, batch, kl_w, lr):
    loss_fn = make_loss_fn(vae, nsamples=1, train=True)
    (_, aux), grads = jax.value_and_grad(
        lambda p: loss_fn(p, key_folded, batch, kl_w), has_aux=True)(params)
    grads, _ = clip_by_global_norm(grads, CFG.clip_grad)
    new_p, _ = sgd_update(params, grads, lr)
    return jax.tree.map(np.asarray, new_p), [float(x) for x in aux]


def _diff(tree_a, tree_b):
    bmap = dict(jax.tree_util.tree_leaves_with_path(tree_b))
    return max(float(jnp.abs(np.asarray(a) - np.asarray(bmap[p])).max())
               for p, a in jax.tree_util.tree_leaves_with_path(tree_a))


def test_tp_token_logp_and_custom_vjp_match_dense():
    """Forward = log_softmax gather; grads (dh full+replicated, dpred
    shard-local) = the dense VJP, on a pure-tp 1x8 axis."""
    from jax.sharding import PartitionSpec as P

    rng = np.random.RandomState(1)
    N = 16
    h = jnp.asarray(rng.randn(N, NH).astype(np.float32))
    pred = jnp.asarray(rng.randn(NH, V).astype(np.float32))
    tgt = jnp.asarray(rng.randint(0, V, (N,)), jnp.int32)
    w = jnp.asarray(rng.randn(N).astype(np.float32))

    mesh = make_tp_mesh(1, 8)

    def local(h, pred_l, tgt, w):
        def f(h, pred_l):
            return jnp.sum(tp_token_logp(h, pred_l, tgt, V) * w)
        val, (dh, dpred_l) = jax.value_and_grad(f, argnums=(0, 1))(h, pred_l)
        return val, dh, dpred_l

    val, dh, dpred = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, "tp"), P(), P()),
        out_specs=(P(), P(), P(None, "tp")), check_vma=False))(
            h, pred, tgt, w)

    def dense(h, pred):
        lp = jax.nn.log_softmax(jnp.dot(h, pred), -1)
        return jnp.sum(jnp.take_along_axis(lp, tgt[:, None], 1)[:, 0] * w)

    val_d, (dh_d, dpred_d) = jax.value_and_grad(dense, argnums=(0, 1))(h, pred)
    np.testing.assert_allclose(float(val), float(val_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dpred), np.asarray(dpred_d),
                               atol=1e-5)


def test_tp_step_matches_single_device():
    """Pure-TP (1x4): updated params equal the single-device step, with
    dropout ON so the replicated-key design is exercised."""
    vae, params, tokens, mask, rw = _setup(dropout=0.5)
    key = jax.random.PRNGKey(7)
    ref_p, aux_ref = _single_device_step(
        vae, params, jax.random.fold_in(key, 0), (tokens, mask, rw),
        jnp.float32(0.8), jnp.float32(0.5))

    mesh = make_tp_mesh(1, 4)
    step = make_tp_train_step(vae, CFG, mesh)
    sp = shard_params(mesh, jax.tree.map(jnp.array, params))
    new_p, aux = step(sp, key, tokens, mask, rw, jnp.float32(0.8),
                      jnp.float32(0.5))
    assert np.allclose([float(x) for x in aux], aux_ref, atol=1e-4)
    assert _diff(new_p, ref_p) < 1e-5


def test_tp_dp_composition_matches_dp():
    """2x2 (dp x tp) reproduces the plain 2-way DP step: same dp key
    folding, same clip-after-psum order, vocab sharding transparent."""
    vae, params, tokens, mask, rw = _setup(dropout=0.3, seed=2)
    key = jax.random.PRNGKey(9)

    dp_mesh = make_mesh(2)
    dp_step = make_dp_train_step(vae, CFG, dp_mesh)
    toks_s, mask_s, rw_s = shard_batch(dp_mesh, tokens, mask, rw)
    p_dp, aux_dp = dp_step(jax.tree.map(jnp.copy, params), key, toks_s,
                           mask_s, rw_s, jnp.float32(1.0), jnp.float32(0.4))
    p_dp = jax.tree.map(np.asarray, p_dp)

    mesh = make_tp_mesh(2, 2)
    step = make_tp_train_step(vae, CFG, mesh)
    sp = shard_params(mesh, jax.tree.map(jnp.array, params))
    p_tp, aux_tp = step(sp, key, tokens, mask, rw, jnp.float32(1.0),
                        jnp.float32(0.4))
    assert np.allclose([float(x) for x in aux_tp],
                       [float(x) for x in aux_dp], atol=1e-4)
    assert _diff(p_tp, p_dp) < 1e-5


def test_tp_eval_matches_vae_loss():
    """DP x TP eval sums equal the single-device eval-mode loss sums."""
    vae, params, tokens, mask, rw = _setup(dropout=0.0, seed=3)
    key = jax.random.PRNGKey(11)
    mesh = make_tp_mesh(2, 4)
    ev = make_tp_eval_step(vae, mesh)
    sp = shard_params(mesh, params)
    aux = ev(sp, key, tokens, mask, rw, jnp.float32(1.0))

    loss_fn = make_loss_fn(vae, nsamples=1, train=False)
    total = None
    for s in range(2):
        sl = slice(s * (B // 2), (s + 1) * (B // 2))
        _, a = loss_fn(params, jax.random.fold_in(key, s),
                       (tokens[sl], mask[sl], rw[sl]), 1.0)
        total = a if total is None else jax.tree.map(jnp.add, total, a)
    assert np.allclose([float(x) for x in aux],
                       [float(x) for x in total], atol=1e-4)


def test_tp_clip_zeroes_nonfinite_grads():
    """An overflowing batch must zero the step (params unchanged), exactly
    like optim.clip_by_global_norm's guard — not NaN-poison the params via
    0 * inf (code-review r3 finding)."""
    vae, params, tokens, mask, rw = _setup(dropout=0.0, seed=5)
    # blow up the output projection so the first step's grads overflow
    params = dict(params, dec=dict(params["dec"],
                                   pred=params["dec"]["pred"] * 1e38))
    mesh = make_tp_mesh(1, 4)
    step = make_tp_train_step(vae, CFG, mesh)
    sp = shard_params(mesh, jax.tree.map(jnp.array, params))
    before = jax.tree.map(np.asarray, params)
    new_p, _ = step(sp, jax.random.PRNGKey(0), tokens, mask, rw,
                    jnp.float32(1.0), jnp.float32(1.0))
    for path, leaf in jax.tree_util.tree_leaves_with_path(new_p):
        assert np.isfinite(np.asarray(leaf)).all(), path
    assert _diff(new_p, before) == 0.0  # zeroed step: params unchanged


def test_vocab_not_divisible_raises():
    vae, params, tokens, mask, rw = _setup(dropout=0.0, seed=4)
    mesh = make_tp_mesh(1, 8)  # 48 % 8 == 0 is fine; use a 5-way... 8 ok
    # V=48 divides 8; build a decoder with V=50 to trigger the check
    enc = GaussianLSTMEncoder(50, NI, NH, NZ)
    dec = LSTMDecoder(50, NI, NH, NZ, dropout_in=0.0, dropout_out=0.0)
    vae2 = VAE(enc, dec)
    p2 = vae2.init(jax.random.PRNGKey(0))
    step = make_tp_train_step(vae2, CFG, mesh)
    with pytest.raises(Exception, match="[vV]ocab|divis|shard"):
        step(shard_params(mesh, p2), jax.random.PRNGKey(0),
             jnp.zeros((B, T), jnp.int32), mask, rw,
             jnp.float32(1.0), jnp.float32(0.1))
