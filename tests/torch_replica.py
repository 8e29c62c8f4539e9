"""Minimal PyTorch replicas of the reference models, for cross-framework
parity testing (VERDICT.md round-1 task 1).

These are written the way the REFERENCE writes them — ``nn.LSTM``,
``nn.Conv2d`` with raster masks, ``log_softmax`` CE — so agreement with the
JAX stack is evidence that the TPU rebuild computes the reference's math,
not merely that two copies of the same code agree. Weights are COPIED from
the JAX pytrees (never re-initialized), so every comparison is exact math
on identical parameters.

Conventions mirrored from the JAX side:
- LSTM gate order (i, f, g, o) == torch's; the JAX pytree keeps both
  biases (b_ih, b_hh) exactly like torch, so SGD dynamics match too.
- JAX is NHWC / HWIO; torch is NCHW / OIHW — permutes are applied at the
  copy boundary and before the encoder's flatten (which is NHWC-ordered).
- JAX convs use XLA SAME padding (lo = total//2, hi = total - lo), which is
  asymmetric for stride 2 — replicated here with F.pad.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a)).clone()


# ---------------------------------------------------------------------------
# Text: GaussianLSTMEncoder + LSTMDecoder (<ref>modules/encoders/enc_lstm.py,
# <ref>modules/decoders/dec_lstm.py)

class TorchTextVAE(nn.Module):
    def __init__(self, jax_params, V: int, ni: int, enc_nh: int, dec_nh: int,
                 nz: int):
        super().__init__()
        self.nz = nz
        enc, dec = jax_params["enc"], jax_params["dec"]
        self.enc_emb = nn.Embedding(V, ni)
        self.enc_lstm = nn.LSTM(ni, enc_nh, batch_first=True)
        self.enc_lin = nn.Linear(enc_nh, 2 * nz, bias=False)
        self.dec_emb = nn.Embedding(V, ni)
        self.dec_lstm = nn.LSTM(ni + nz, dec_nh, batch_first=True)
        self.trans = nn.Linear(nz, dec_nh, bias=False)
        self.pred = nn.Linear(dec_nh, V, bias=False)
        with torch.no_grad():
            self.enc_emb.weight.copy_(t(enc["emb"]))
            self.enc_lstm.weight_ih_l0.copy_(t(enc["lstm"]["wx"]).T)
            self.enc_lstm.weight_hh_l0.copy_(t(enc["lstm"]["wh"]).T)
            self.enc_lstm.bias_ih_l0.copy_(t(enc["lstm"]["b_ih"]))
            self.enc_lstm.bias_hh_l0.copy_(t(enc["lstm"]["b_hh"]))
            self.enc_lin.weight.copy_(t(enc["linear"]).T)
            self.dec_emb.weight.copy_(t(dec["emb"]))
            self.dec_lstm.weight_ih_l0.copy_(t(dec["lstm"]["wx"]).T)
            self.dec_lstm.weight_hh_l0.copy_(t(dec["lstm"]["wh"]).T)
            self.dec_lstm.bias_ih_l0.copy_(t(dec["lstm"]["b_ih"]))
            self.dec_lstm.bias_hh_l0.copy_(t(dec["lstm"]["b_hh"]))
            self.trans.weight.copy_(t(dec["trans"]).T)
            self.pred.weight.copy_(t(dec["pred"]).T)

    # encoder --------------------------------------------------------------
    def enc_forward(self, tokens: torch.Tensor, lengths: torch.Tensor):
        out, _ = self.enc_lstm(self.enc_emb(tokens))
        h_final = out[torch.arange(tokens.shape[0]), lengths - 1]
        stats = self.enc_lin(h_final)
        return stats[:, : self.nz], stats[:, self.nz:]

    # decoder --------------------------------------------------------------
    def reconstruct_error(self, tokens: torch.Tensor, mask: torch.Tensor,
                          z: torch.Tensor) -> torch.Tensor:
        """tokens [B, T] = <s> w.. </s> pad..; z [B, K, nz] -> [B, K]."""
        B, T = tokens.shape
        K = z.shape[1]
        recs = []
        for k in range(K):
            zk = z[:, k, :]
            c0 = self.trans(zk)[None]          # [1, B, H]
            h0 = torch.tanh(c0)
            emb = self.dec_emb(tokens[:, :-1])
            inp = torch.cat(
                [emb, zk[:, None, :].expand(B, T - 1, self.nz)], dim=-1)
            out, _ = self.dec_lstm(inp, (h0, c0))
            logp = F.log_softmax(self.pred(out), dim=-1)
            tok_lp = logp.gather(-1, tokens[:, 1:, None].long())[..., 0]
            recs.append(-(tok_lp * mask[:, 1:]).sum(-1))
        return torch.stack(recs, dim=1)

    # estimators (the reference's formulas) ---------------------------------
    def loss(self, tokens, mask, lengths, eps, kl_weight: float):
        """eps [B, K, nz] is the SHARED reparameterization noise."""
        mu, logvar = self.enc_forward(tokens, lengths)
        z = mu[:, None] + eps * torch.exp(0.5 * logvar)[:, None]
        rec = self.reconstruct_error(tokens, mask, z).mean(1)
        kl = 0.5 * (mu ** 2 + logvar.exp() - logvar - 1.0).sum(-1)
        return rec + kl_weight * kl, rec, kl

    def nll_iw(self, tokens, mask, lengths, eps):
        """eps [B, K, nz] shared across frameworks -> per-sentence IW-NLL."""
        mu, logvar = self.enc_forward(tokens, lengths)
        z = mu[:, None] + eps * torch.exp(0.5 * logvar)[:, None]
        K = z.shape[1]
        log_prior = -0.5 * (z ** 2).sum(-1) - 0.5 * self.nz * math.log(2 * math.pi)
        log_gen = -self.reconstruct_error(tokens, mask, z)
        dev = z - mu[:, None]
        log_post = (-0.5 * (dev ** 2 / logvar.exp()[:, None]).sum(-1)
                    - 0.5 * (self.nz * math.log(2 * math.pi)
                             + logvar.sum(-1))[:, None])
        log_w = log_prior + log_gen - log_post
        return -(torch.logsumexp(log_w, dim=1) - math.log(K))


def torch_calc_mi(mu: torch.Tensor, logvar: torch.Tensor,
                  z: torch.Tensor) -> torch.Tensor:
    """The paper's MI estimator (<ref>encoder.py §calc_mi), z [B, nz] shared."""
    B, nz = mu.shape
    neg_entropy = (-0.5 * nz * (1.0 + math.log(2 * math.pi))
                   - 0.5 * logvar.sum(-1)).mean()
    dev = z[:, None, :] - mu[None]
    log_density = (-0.5 * (dev ** 2 / logvar.exp()[None]).sum(-1)
                   - 0.5 * (nz * math.log(2 * math.pi)
                            + logvar.sum(-1))[None])
    log_qz = torch.logsumexp(log_density, dim=1) - math.log(B)
    return neg_entropy - log_qz.mean()


def clipped_sgd_step(model: nn.Module, loss: torch.Tensor, lr: float,
                     max_norm: float = 5.0):
    """The reference's step: backward, clip ALL grads by global norm, SGD."""
    model.zero_grad()
    loss.backward()
    torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm)
    with torch.no_grad():
        for p in model.parameters():
            if p.grad is not None:
                p -= lr * p.grad


# ---------------------------------------------------------------------------
# Image: ResNetEncoderV2 + PixelCNNDecoderV2
# (<ref>modules/encoders/enc_resnet_v2.py, <ref>modules/decoders/dec_pixelcnn_v2.py)

def _same_pad(x: torch.Tensor, k: int, s: int) -> torch.Tensor:
    """XLA SAME padding (lo = total//2, hi = total - lo) for NCHW."""
    ih, iw = x.shape[2], x.shape[3]
    ph = max((-(-ih // s) - 1) * s + k - ih, 0)
    pw = max((-(-iw // s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


def _conv_hwio(w) -> torch.Tensor:  # HWIO -> OIHW
    return t(w).permute(3, 2, 0, 1).contiguous()


def _raster_mask(kh: int, kw: int, include_center: bool) -> torch.Tensor:
    m = torch.zeros(kh, kw)
    ch, cw = kh // 2, kw // 2
    m[:ch] = 1.0
    m[ch, :cw] = 1.0
    if include_center:
        m[ch, cw] = 1.0
    return m


class TorchImageVAE(nn.Module):
    def __init__(self, jax_params, nz: int, channels, img_size,
                 n_layers: int, filters: int, first_kernel: int,
                 kernel: int = 3):
        super().__init__()
        self.nz = nz
        enc, dec = jax_params["enc"], jax_params["dec"]

        # encoder ------------------------------------------------------
        self.blocks = nn.ModuleList()
        cin, h = img_size[2], img_size[0]
        for i, c in enumerate(channels):
            blk = nn.ModuleDict({
                "down": nn.Conv2d(cin, c, 3, stride=2, bias=False),
                "conv1": nn.Conv2d(c, c, 3, padding=1, bias=False),
                "conv2": nn.Conv2d(c, c, 3, padding=1, bias=False),
            })
            with torch.no_grad():
                blk["down"].weight.copy_(_conv_hwio(enc["blocks"][i]["down"]))
                blk["conv1"].weight.copy_(_conv_hwio(enc["blocks"][i]["conv1"]))
                blk["conv2"].weight.copy_(_conv_hwio(enc["blocks"][i]["conv2"]))
            self.blocks.append(blk)
            cin, h = c, -(-h // 2)
        self.fc = nn.Linear(h * h * cin, 2 * nz)
        with torch.no_grad():
            self.fc.weight.copy_(t(enc["fc"]).T)
            self.fc.bias.copy_(t(enc["fc_b"]))

        # decoder ------------------------------------------------------
        self.layers = nn.ModuleList()
        self.zconds = nn.ModuleList()
        kers = [first_kernel] + [kernel] * (n_layers - 1)
        cin = img_size[2]
        masks = []
        for i, k in enumerate(kers):
            conv = nn.Conv2d(cin, filters, k, padding=k // 2, bias=True)
            zc = nn.Linear(nz, filters, bias=False)
            with torch.no_grad():
                conv.weight.copy_(_conv_hwio(dec["layers"][i]["w"]))
                conv.bias.copy_(t(dec["layers"][i]["b"]))
                zc.weight.copy_(t(dec["layers"][i]["wz"]).T)
            self.layers.append(conv)
            self.zconds.append(zc)
            masks.append(_raster_mask(k, k, include_center=(i > 0)))
            cin = filters
        self.out_conv = nn.Conv2d(cin, img_size[2], 1, bias=True)
        with torch.no_grad():
            self.out_conv.weight.copy_(_conv_hwio(dec["out_w"]))
            self.out_conv.bias.copy_(t(dec["out_b"]))
        for i, m in enumerate(masks):
            self.register_buffer(f"mask_{i}", m)

    # encoder --------------------------------------------------------------
    def enc_forward(self, x_nhwc: torch.Tensor):
        h = x_nhwc.permute(0, 3, 1, 2)
        for blk in self.blocks:
            h = F.elu(blk["down"](_same_pad(h, 3, 2)))
            r = F.elu(blk["conv1"](h))
            r = blk["conv2"](r)
            h = F.elu(h + r)
        h = h.permute(0, 2, 3, 1).flatten(1)  # NHWC flatten to match JAX
        stats = self.fc(h)
        return stats[:, : self.nz], stats[:, self.nz:]

    # decoder --------------------------------------------------------------
    def _logits(self, x_nhwc: torch.Tensor, z_flat: torch.Tensor):
        h = x_nhwc.permute(0, 3, 1, 2)
        for i, (conv, zc) in enumerate(zip(self.layers, self.zconds)):
            masked_w = conv.weight * getattr(self, f"mask_{i}")
            h = F.conv2d(h, masked_w, conv.bias, padding=conv.padding)
            h = F.elu(h + zc(z_flat)[:, :, None, None])
        return self.out_conv(h).permute(0, 2, 3, 1)  # back to NHWC

    def reconstruct_error(self, x_nhwc: torch.Tensor, z: torch.Tensor):
        """x [B, H, W, C] binary, z [B, K, nz] -> [B, K] summed BCE."""
        B, K = x_nhwc.shape[0], z.shape[1]
        recs = []
        for k in range(K):
            logits = self._logits(x_nhwc, z[:, k, :])
            nll = F.binary_cross_entropy_with_logits(
                logits, x_nhwc, reduction="none")
            recs.append(nll.sum((1, 2, 3)))
        return torch.stack(recs, dim=1)

    def loss(self, x_nhwc, eps, kl_weight: float):
        mu, logvar = self.enc_forward(x_nhwc)
        z = mu[:, None] + eps * torch.exp(0.5 * logvar)[:, None]
        rec = self.reconstruct_error(x_nhwc, z).mean(1)
        kl = 0.5 * (mu ** 2 + logvar.exp() - logvar - 1.0).sum(-1)
        return rec + kl_weight * kl, rec, kl

    def nll_iw(self, x_nhwc, eps):
        mu, logvar = self.enc_forward(x_nhwc)
        z = mu[:, None] + eps * torch.exp(0.5 * logvar)[:, None]
        K = z.shape[1]
        log_prior = -0.5 * (z ** 2).sum(-1) - 0.5 * self.nz * math.log(2 * math.pi)
        log_gen = -self.reconstruct_error(x_nhwc, z)
        dev = z - mu[:, None]
        log_post = (-0.5 * (dev ** 2 / logvar.exp()[:, None]).sum(-1)
                    - 0.5 * (self.nz * math.log(2 * math.pi)
                             + logvar.sum(-1))[:, None])
        log_w = log_prior + log_gen - log_post
        return -(torch.logsumexp(log_w, dim=1) - math.log(K))
