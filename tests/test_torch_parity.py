"""Full-model cross-framework parity: the JAX stack vs a PyTorch replica
written the way the reference writes it (VERDICT.md round-1 task 1).

Identical weights are loaded both ways and every estimator the paper
reports is compared on shared randomness (the reparameterization noise is
extracted from the JAX PRNG and fed to torch), so agreement is evidence the
TPU rebuild computes the reference's math:

- posterior (mu, logvar) from the LSTM / ResNet encoders
- per-sentence loss / rec / KL       (<ref>vae.py §loss)
- importance-weighted NLL            (<ref>vae.py §nll_iw)
- mutual information                 (<ref>encoder.py §calc_mi)
- active units                       (<ref>text.py §calc_au)
- one clipped-SGD training step's parameter delta
  (<ref>text.py §main: backward, clip_grad_norm_(5.0), separate SGD steps)

Tolerances are fp32 cross-framework: the LSTM recurrence / conv stacks
accumulate reduction-order differences of ~1e-6 per step which compound
through token sums; 2e-3 absolute on O(50) NLL sums is ~4e-5 relative.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

# The cross-framework suite is the default run's long tail (~7 min of CPU
# jit + torch): full coverage stays in `pytest tests/`, the fast default is
# `pytest -m "not slow"` (README "Tests") — VERDICT.md r2 weak #5.
pytestmark = pytest.mark.slow

from vae_lagging_encoder_tpu.models import (VAE, GaussianLSTMEncoder,
                                            LSTMDecoder, PixelCNNDecoderV2,
                                            ResNetEncoderV2)
from vae_lagging_encoder_tpu.train.optim import (clip_by_global_norm,
                                                 sgd_update)
from torch_replica import (TorchImageVAE, TorchTextVAE, clipped_sgd_step,
                           torch_calc_mi)

V, NI, ENC_NH, DEC_NH, NZ = 43, 16, 24, 24, 6
B, T = 6, 12
IMG_NZ, IMG_CH, IMG_LAYERS, IMG_FILTERS = 5, (8, 8), 3, 8


def _text_setup():
    enc = GaussianLSTMEncoder(V, NI, ENC_NH, NZ)
    dec = LSTMDecoder(V, NI, DEC_NH, NZ, dropout_in=0.0, dropout_out=0.0)
    vae = VAE(enc, dec)
    params = vae.init(jax.random.PRNGKey(7))
    tm = TorchTextVAE(jax.device_get(params), V, NI, ENC_NH, DEC_NH, NZ)

    rng = np.random.RandomState(3)
    lengths = rng.randint(5, T + 1, size=B)
    lengths[0] = T  # at least one full row
    tokens = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), np.float32)
    for b, L in enumerate(lengths):
        tokens[b, 0] = 2  # <s>
        tokens[b, 1:L - 1] = rng.randint(4, V, size=L - 2)
        tokens[b, L - 1] = 3  # </s>
        mask[b, :L] = 1.0
    return vae, params, tm, tokens, mask, lengths


def _tt(tokens, mask, lengths):
    return (torch.from_numpy(tokens.astype(np.int64)),
            torch.from_numpy(mask), torch.from_numpy(lengths))


class TestTextParity:
    def test_posterior_and_loss(self):
        vae, params, tm, tokens, mask, lengths = _text_setup()
        tok_t, mask_t, len_t = _tt(tokens, mask, lengths)

        mu_j, lv_j = vae.encoder.forward(params["enc"], jnp.asarray(tokens),
                                         jnp.asarray(mask))
        with torch.no_grad():
            mu_t, lv_t = tm.enc_forward(tok_t, len_t)
        np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), atol=1e-5)

        # loss/rec/KL through the REAL vae.loss with shared eps
        key = jax.random.PRNGKey(11)
        k_enc, _ = jax.random.split(key)
        eps = np.asarray(jax.random.normal(k_enc, (B, 1, NZ)))
        loss_j, rec_j, kl_j = vae.loss(params, key, jnp.asarray(tokens),
                                       jnp.asarray(mask), kl_weight=0.7,
                                       nsamples=1, train=True)
        with torch.no_grad():
            loss_t, rec_t, kl_t = tm.loss(tok_t, mask_t, len_t,
                                          torch.from_numpy(eps), 0.7)
        np.testing.assert_allclose(np.asarray(rec_j), rec_t.numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(kl_j), kl_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(loss_j), loss_t.numpy(), atol=2e-3)

    def test_multi_sample_reconstruct_error(self):
        vae, params, tm, tokens, mask, lengths = _text_setup()
        tok_t, mask_t, _ = _tt(tokens, mask, lengths)
        K = 3
        z = np.random.RandomState(5).normal(size=(B, K, NZ)).astype(np.float32)
        rec_j = vae.decoder.reconstruct_error(
            params["dec"], jnp.asarray(tokens), jnp.asarray(mask),
            jnp.asarray(z))
        with torch.no_grad():
            rec_t = tm.reconstruct_error(tok_t, mask_t, torch.from_numpy(z))
        np.testing.assert_allclose(np.asarray(rec_j), rec_t.numpy(), atol=2e-3)

    def test_iw_nll(self):
        vae, params, tm, tokens, mask, lengths = _text_setup()
        tok_t, mask_t, len_t = _tt(tokens, mask, lengths)
        key = jax.random.PRNGKey(21)
        nsamples, ns = 20, 10  # 2 chunks — exercises the chunked path
        nll_j = vae.nll_iw(params, key, jnp.asarray(tokens),
                           jnp.asarray(mask), nsamples=nsamples, ns=ns)
        # reproduce the per-chunk eps stream nll_iw draws
        eps = np.concatenate([
            np.asarray(jax.random.normal(jax.random.fold_in(key, i),
                                         (B, ns, NZ)))
            for i in range(nsamples // ns)], axis=1)
        with torch.no_grad():
            nll_t = tm.nll_iw(tok_t, mask_t, len_t, torch.from_numpy(eps))
        np.testing.assert_allclose(np.asarray(nll_j), nll_t.numpy(), atol=3e-3)

    def test_mi_and_au(self):
        vae, params, tm, tokens, mask, lengths = _text_setup()
        tok_t, _, len_t = _tt(tokens, mask, lengths)
        key = jax.random.PRNGKey(33)
        mi_j = vae.calc_mi_q(params, key, jnp.asarray(tokens), jnp.asarray(mask))
        with torch.no_grad():
            mu_t, lv_t = tm.enc_forward(tok_t, len_t)
            eps = np.asarray(jax.random.normal(key, (B, 1, NZ)))[:, 0]
            z_t = mu_t + torch.from_numpy(eps) * torch.exp(0.5 * lv_t)
            mi_t = torch_calc_mi(mu_t, lv_t, z_t)
        np.testing.assert_allclose(float(mi_j), float(mi_t), atol=1e-4)

        # AU: Var_x[mu(x)] > delta, two-pass mean/var (<ref>text.py §calc_au)
        mu_j = np.asarray(vae.calc_infer_mean(params, jnp.asarray(tokens),
                                              jnp.asarray(mask)))
        var_j = ((mu_j - mu_j.mean(0)) ** 2).sum(0) / (B - 1)
        var_t = mu_t.numpy().var(axis=0, ddof=1)
        np.testing.assert_allclose(var_j, var_t, atol=1e-6)
        assert int((var_j > 0.01).sum()) == int((var_t > 0.01).sum())

    def test_clipped_sgd_step_parity(self):
        """One reference training step: shared-eps loss.mean(), backward,
        global-norm clip 5.0, SGD — parameter deltas must match."""
        vae, params, tm, tokens, mask, lengths = _text_setup()
        tok_t, mask_t, len_t = _tt(tokens, mask, lengths)
        key = jax.random.PRNGKey(44)
        k_enc, _ = jax.random.split(key)
        eps = np.asarray(jax.random.normal(k_enc, (B, 1, NZ)))
        lr, kl_w = 0.5, 0.9

        def mean_loss(p):
            loss, _, _ = vae.loss(p, key, jnp.asarray(tokens),
                                  jnp.asarray(mask), kl_weight=kl_w,
                                  nsamples=1, train=True)
            return loss.mean()

        grads = jax.grad(mean_loss)(params)
        clipped, _ = clip_by_global_norm(grads, 5.0)
        new_params, _ = sgd_update(params, clipped, lr)

        loss_t, _, _ = tm.loss(tok_t, mask_t, len_t, torch.from_numpy(eps), kl_w)
        clipped_sgd_step(tm, loss_t.mean(), lr, max_norm=5.0)

        pairs = [
            (new_params["enc"]["emb"], tm.enc_emb.weight),
            (new_params["enc"]["lstm"]["wx"], tm.enc_lstm.weight_ih_l0.T),
            (new_params["enc"]["lstm"]["wh"], tm.enc_lstm.weight_hh_l0.T),
            (new_params["enc"]["lstm"]["b_ih"], tm.enc_lstm.bias_ih_l0),
            (new_params["enc"]["lstm"]["b_hh"], tm.enc_lstm.bias_hh_l0),
            (new_params["enc"]["linear"], tm.enc_lin.weight.T),
            (new_params["dec"]["emb"], tm.dec_emb.weight),
            (new_params["dec"]["lstm"]["wx"], tm.dec_lstm.weight_ih_l0.T),
            (new_params["dec"]["lstm"]["wh"], tm.dec_lstm.weight_hh_l0.T),
            (new_params["dec"]["lstm"]["b_ih"], tm.dec_lstm.bias_ih_l0),
            (new_params["dec"]["lstm"]["b_hh"], tm.dec_lstm.bias_hh_l0),
            (new_params["dec"]["trans"], tm.trans.weight.T),
            (new_params["dec"]["pred"], tm.pred.weight.T),
        ]
        for j, tt_ in pairs:
            np.testing.assert_allclose(np.asarray(j), tt_.detach().numpy(),
                                       atol=2e-4)


# ---------------------------------------------------------------------------
class TestImageParity:
    def _setup(self):
        enc = ResNetEncoderV2(IMG_NZ, channels=IMG_CH)
        dec = PixelCNNDecoderV2(IMG_NZ, n_layers=IMG_LAYERS,
                                filters=IMG_FILTERS, first_kernel=7)
        vae = VAE(enc, dec)
        params = vae.init(jax.random.PRNGKey(9))
        tm = TorchImageVAE(jax.device_get(params), IMG_NZ, IMG_CH,
                           (28, 28, 1), IMG_LAYERS, IMG_FILTERS, 7)
        x = (np.random.RandomState(1).rand(4, 28, 28, 1) > 0.5).astype(np.float32)
        return vae, params, tm, x

    def test_posterior_and_loss(self):
        vae, params, tm, x = self._setup()
        x_t = torch.from_numpy(x)
        mu_j, lv_j = vae.encoder.forward(params["enc"], jnp.asarray(x))
        with torch.no_grad():
            mu_t, lv_t = tm.enc_forward(x_t)
        np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), atol=1e-4)

        key = jax.random.PRNGKey(13)
        k_enc, _ = jax.random.split(key)
        eps = np.asarray(jax.random.normal(k_enc, (4, 1, IMG_NZ)))
        loss_j, rec_j, kl_j = vae.loss(params, key, jnp.asarray(x),
                                       kl_weight=0.8, nsamples=1)
        with torch.no_grad():
            loss_t, rec_t, kl_t = tm.loss(x_t, torch.from_numpy(eps), 0.8)
        np.testing.assert_allclose(np.asarray(rec_j), rec_t.numpy(), atol=5e-3)
        np.testing.assert_allclose(np.asarray(kl_j), kl_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(loss_j), loss_t.numpy(), atol=5e-3)

    def test_iw_nll(self):
        vae, params, tm, x = self._setup()
        key = jax.random.PRNGKey(17)
        nsamples, ns = 10, 10
        nll_j = vae.nll_iw(params, key, jnp.asarray(x), nsamples=nsamples, ns=ns)
        eps = np.asarray(jax.random.normal(jax.random.fold_in(key, 0),
                                           (4, ns, IMG_NZ)))
        with torch.no_grad():
            nll_t = tm.nll_iw(torch.from_numpy(x), torch.from_numpy(eps))
        np.testing.assert_allclose(np.asarray(nll_j), nll_t.numpy(), atol=1e-2)

    def test_clipped_sgd_step_parity(self):
        vae, params, tm, x = self._setup()
        key = jax.random.PRNGKey(19)
        k_enc, _ = jax.random.split(key)
        eps = np.asarray(jax.random.normal(k_enc, (4, 1, IMG_NZ)))
        lr, kl_w = 0.1, 1.0

        def mean_loss(p):
            loss, _, _ = vae.loss(p, key, jnp.asarray(x), kl_weight=kl_w,
                                  nsamples=1)
            return loss.mean()

        grads = jax.grad(mean_loss)(params)
        clipped, _ = clip_by_global_norm(grads, 5.0)
        new_params, _ = sgd_update(params, clipped, lr)

        loss_t, _, _ = tm.loss(torch.from_numpy(x), torch.from_numpy(eps), kl_w)
        clipped_sgd_step(tm, loss_t.mean(), lr, max_norm=5.0)

        def chk(j, tt_, atol=3e-4):
            np.testing.assert_allclose(np.asarray(j), tt_.detach().numpy(),
                                       atol=atol)

        for i, blk in enumerate(new_params["enc"]["blocks"]):
            tb = tm.blocks[i]
            chk(blk["down"], tb["down"].weight.permute(2, 3, 1, 0))
            chk(blk["conv1"], tb["conv1"].weight.permute(2, 3, 1, 0))
            chk(blk["conv2"], tb["conv2"].weight.permute(2, 3, 1, 0))
        chk(new_params["enc"]["fc"], tm.fc.weight.T)
        chk(new_params["enc"]["fc_b"], tm.fc.bias)
        for i, layer in enumerate(new_params["dec"]["layers"]):
            chk(layer["w"], tm.layers[i].weight.permute(2, 3, 1, 0))
            chk(layer["b"], tm.layers[i].bias)
            chk(layer["wz"], tm.zconds[i].weight.T)
        chk(new_params["dec"]["out_w"], tm.out_conv.weight.permute(2, 3, 1, 0))
        chk(new_params["dec"]["out_b"], tm.out_conv.bias)
