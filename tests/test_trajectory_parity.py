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


def test_image_aggressive_trajectory_matches():
    """Image-path trajectory parity: the ResNet+PixelCNN fused epoch
    (dynamic binarization drawn on device EVERY step AND every inner burn,
    <ref>image.py §main / SURVEY.md §3.4) tracked against the torch replica
    over 2 aggressive epochs. The binarization draw and the
    reparameterization eps are both re-derived from the same PRNG schedule
    (step key -> split(k_loss) -> bernoulli key + vae.loss's k_enc), so the
    torch side sees the identical binary images and noise while making its
    own gradient/clip/plateau decisions — multi-step evidence that the image
    modality's dynamics (not just one step, test_torch_parity.py) match.

    Measured on this box (2026-08-19, jax 0.9.0 / torch CPU f32): inner
    counts match exactly, per-epoch summed loss <= 4.3e-6 relative, worst
    final param drift 4.6e-4 absolute (conv stacks compound fp32
    reduction-order noise faster than the LSTM path; the discrete plateau
    decisions and epoch losses matching is the semantic evidence). Bounds
    below carry ~10x headroom on params, >20x on losses."""
    from vae_lagging_encoder_tpu.data import ImagePool
    from vae_lagging_encoder_tpu.models import (PixelCNNDecoderV2,
                                                ResNetEncoderV2)
    from vae_lagging_encoder_tpu.train.epoch import make_image_loss_fn
    from torch_replica import TorchImageVAE
    import torch

    INZ, ICH, ILAY, IFIL, IB, IHW = 5, (4, 4), 2, 6, 4, 8
    cfg = get_config("omniglot", batch_size=IB, optim="sgd", momentum=0.0,
                     lr=0.1, clip_grad=5.0, kl_start=0.1, warm_up=1,
                     burn_max_iters=4, burn_window=2, nsamples=1)
    probs = np.random.RandomState(5).rand(24, IHW, IHW, 1).astype(np.float32)
    pool = ImagePool(probs, IB)
    enc = ResNetEncoderV2(INZ, channels=ICH, img_size=(IHW, IHW, 1))
    dec = PixelCNNDecoderV2(INZ, img_size=(IHW, IHW, 1), n_layers=ILAY,
                            filters=IFIL, first_kernel=3)
    vae = VAE(enc, dec)
    params = vae.init(jax.random.PRNGKey(21))
    tm = TorchImageVAE(jax.device_get(params), INZ, ICH, (IHW, IHW, 1),
                       ILAY, IFIL, 3)
    host_probs = [np.asarray(a) for a in pool.arrays[0]]  # (probs, rw) stacks

    enc_t = ([p for blk in tm.blocks for p in blk.parameters()]
             + list(tm.fc.parameters()))
    dec_t = (list(tm.layers.parameters()) + list(tm.zconds.parameters())
             + list(tm.out_conv.parameters()))

    def torch_step(i_batch, key_loss, kl_w, which):
        """Mirror make_image_loss_fn + clip-ALL + selective SGD: re-derive
        the on-device bernoulli draw and vae.loss's eps from key_loss."""
        pb, rw = host_probs[0][i_batch], host_probs[1][i_batch]
        k_bin, k_loss2 = jax.random.split(key_loss)
        x = np.asarray(jax.random.bernoulli(k_bin, jnp.asarray(pb)),
                       np.float32)
        k_enc, _ = jax.random.split(k_loss2)
        eps = np.asarray(jax.random.normal(k_enc, (IB, 1, INZ)), np.float32)
        loss_rows, _, _ = tm.loss(torch.from_numpy(x), torch.from_numpy(eps),
                                  float(kl_w))
        w = torch.from_numpy(rw)
        loss_sum = (loss_rows * w).sum()
        obj = loss_sum / torch.clamp(w.sum(), min=1.0)
        tm.zero_grad()
        obj.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), cfg.clip_grad)
        upd = {"enc": enc_t, "dec": dec_t,
               "both": enc_t + dec_t}[which]
        with torch.no_grad():
            for p in upd:
                if p.grad is not None:
                    p -= cfg.lr * p.grad
        return float(loss_sum.detach()), float(rw.sum()) * IHW * IHW

    def torch_inner(key, kl_w):
        pre, cur, pixels, sub = math.inf, 0.0, 0.0, 0
        while sub < cfg.burn_max_iters:
            key, k_pick, k_loss = jax.random.split(key, 3)
            flat = int(jax.random.randint(k_pick, (), 0, pool.num_batches))
            ls, npx = torch_step(flat, k_loss, kl_w, "enc")
            sub += 1
            cur += ls
            pixels += npx
            if sub % cfg.burn_window == 0:
                avg = cur / max(pixels, 1.0)
                if pre < avg:
                    break
                pre, cur, pixels = avg, 0.0, 0.0
        return sub

    epoch_fn, opt_init = make_train_epoch(
        vae, pool, cfg, loss_fn=make_image_loss_fn(vae, nsamples=1))
    opt_state = opt_init(params)
    anneal = np.float32((1.0 - cfg.kl_start) / (1 * pool.num_batches))
    rng = np.random.RandomState(2)
    kl_j, kl_t = jnp.float32(cfg.kl_start), float(cfg.kl_start)
    for epoch in range(2):
        order = rng.permutation(pool.num_batches).astype(np.int32)
        k_e = jax.random.fold_in(jax.random.PRNGKey(23), epoch)
        params, opt_state, kl_j, sums, inner_j = epoch_fn(
            params, opt_state, k_e, kl_j, jnp.float32(cfg.lr),
            jnp.asarray(order), aggressive=True)
        key, inner_t, loss_t = k_e, 0, 0.0
        for flat in order:
            key, k_inner, k_loss = jax.random.split(key, 3)
            kl_t = float(np.minimum(np.float32(1.0), np.float32(kl_t) + anneal))
            inner_t += torch_inner(k_inner, kl_t)
            ls, _ = torch_step(int(flat), k_loss, kl_t, "dec")
            loss_t += ls
        # discrete plateau decisions must agree EXACTLY
        assert int(inner_j) == inner_t, (epoch, int(inner_j), inner_t)
        assert inner_t > 0
        np.testing.assert_allclose(float(kl_j), kl_t, rtol=1e-6)
        np.testing.assert_allclose(float(sums[0]), loss_t, rtol=1e-4)

    p = jax.device_get(params)
    worst = 0.0
    for i, blk in enumerate(p["enc"]["blocks"]):
        tb = tm.blocks[i]
        for name, tw in (("down", tb["down"]), ("conv1", tb["conv1"]),
                         ("conv2", tb["conv2"])):
            d = np.abs(np.asarray(blk[name])
                       - tw.weight.permute(2, 3, 1, 0).detach().numpy()).max()
            worst = max(worst, float(d))
    worst = max(worst, float(np.abs(
        np.asarray(p["enc"]["fc"]) - tm.fc.weight.T.detach().numpy()).max()))
    for i, layer in enumerate(p["dec"]["layers"]):
        worst = max(worst, float(np.abs(
            np.asarray(layer["w"])
            - tm.layers[i].weight.permute(2, 3, 1, 0).detach().numpy()).max()))
        worst = max(worst, float(np.abs(
            np.asarray(layer["wz"])
            - tm.zconds[i].weight.T.detach().numpy()).max()))
    worst = max(worst, float(np.abs(
        np.asarray(p["dec"]["out_w"])
        - tm.out_conv.weight.permute(2, 3, 1, 0).detach().numpy()).max()))
    # measured 4.6e-4; ~10x headroom (docstring)
    assert worst < 5e-3, worst


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
