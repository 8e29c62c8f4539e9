"""Gaussian-posterior encoder machinery.

Parity: <ref>modules/encoders/encoder.py §GaussianEncoderBase — shared
reparameterization, analytic KL vs N(0, I), inference-distribution
evaluation, and the paper's mutual-information estimator ``calc_mi``
(SURVEY.md §2). All estimators are pure functions on (mu, logvar) so they
run as fused on-device reductions and can be called from inside jit /
``lax.while_loop`` (the in-graph MI plateau check).

Masking addendum (no reference equivalent): every batch may contain
zero-weight pad rows (TPU static batch shapes); estimators take an optional
``row_weight`` so pad rows drop out of means and out of the aggregate
posterior mixture exactly.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.numeric import log_sum_exp


def reparameterize(key: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray,
                   nsamples: int = 1) -> jnp.ndarray:
    """z = mu + std * eps, eps ~ N(0, I). Returns [B, nsamples, nz].

    Parity: <ref>modules/encoders/encoder.py §reparameterize(mu, logvar, nsamples).
    """
    B, nz = mu.shape
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, (B, nsamples, nz), mu.dtype)
    return mu[:, None, :] + eps * std[:, None, :]


def gaussian_kl(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Analytic KL(q(z|x) || N(0, I)) per row: [B].

    Parity: <ref>modules/encoders/encoder.py §encode's KL term.
    """
    return 0.5 * jnp.sum(mu ** 2 + jnp.exp(logvar) - logvar - 1.0, axis=-1)


def eval_inference_dist(z: jnp.ndarray, mu: jnp.ndarray,
                        logvar: jnp.ndarray) -> jnp.ndarray:
    """log q(z|x) for z [B, K, nz] under per-row Gaussians: [B, K].

    Parity: <ref>modules/encoders/encoder.py §eval_inference_dist.
    """
    nz = mu.shape[-1]
    var = jnp.exp(logvar)
    dev = z - mu[:, None, :]
    return (-0.5 * jnp.sum(dev ** 2 / var[:, None, :], axis=-1)
            - 0.5 * (nz * math.log(2 * math.pi) + jnp.sum(logvar, axis=-1))[:, None])


def calc_mi(key: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray,
            row_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """The paper's MI estimator over one batch (scalar).

    Parity: <ref>modules/encoders/encoder.py §calc_mi —
    I(x; z) ≈ E_x[-H(q(z|x))] - E_x,z[log q(z)] with the aggregate q(z)
    approximated as the batch mixture via logsumexp (the O(B²·nz) pairwise
    term, which is a single fused broadcast-reduce on TPU).
    """
    B, nz = mu.shape
    if row_weight is None:
        row_weight = jnp.ones((B,), mu.dtype)
    n = jnp.maximum(row_weight.sum(), 1.0)

    # E_x[-H(q(z|x))] = E_x[ -nz/2 (1 + log 2π) - 1/2 Σ logvar ]
    neg_entropy = jnp.sum(
        row_weight * (-0.5 * nz * (1.0 + math.log(2 * math.pi))
                      - 0.5 * jnp.sum(logvar, axis=-1))) / n

    # one z per x (reference uses nsamples=1 here)
    z = reparameterize(key, mu, logvar, nsamples=1)[:, 0, :]  # [B, nz]

    # pairwise log q(z_i | x_j): [B, B]
    var = jnp.exp(logvar)
    dev = z[:, None, :] - mu[None, :, :]
    log_density = (-0.5 * jnp.sum(dev ** 2 / var[None, :, :], axis=-1)
                   - 0.5 * (nz * math.log(2 * math.pi)
                            + jnp.sum(logvar, axis=-1))[None, :])
    # exclude pad rows from the mixture (log-weight -inf) and from the mean
    log_w = jnp.where(row_weight > 0, 0.0, -jnp.inf)[None, :]
    log_qz = log_sum_exp(log_density + log_w, dim=1) - jnp.log(n)
    log_qz_mean = jnp.sum(row_weight * log_qz) / n
    return neg_entropy - log_qz_mean


class GaussianEncoderBase:
    """Static-config base; subclasses implement ``init`` and ``forward``.

    ``forward(params, x, mask) -> (mu [B, nz], logvar [B, nz])``.
    """

    nz: int

    def init(self, key) -> Dict:
        raise NotImplementedError

    def forward(self, params: Dict, x: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    # --- shared Gaussian machinery (parity with GaussianEncoderBase) ----
    def sample(self, params, key, x, mask=None, nsamples: int = 1):
        mu, logvar = self.forward(params, x, mask)
        z = reparameterize(key, mu, logvar, nsamples)
        return z, (mu, logvar)

    def encode(self, params, key, x, mask=None, nsamples: int = 1):
        """Returns (z [B, K, nz], KL [B])."""
        mu, logvar = self.forward(params, x, mask)
        z = reparameterize(key, mu, logvar, nsamples)
        return z, gaussian_kl(mu, logvar)

    def eval_inference_dist(self, params, x, z, mask=None):
        mu, logvar = self.forward(params, x, mask)
        return eval_inference_dist(z, mu, logvar)

    def calc_mi(self, params, key, x, mask=None, row_weight=None):
        mu, logvar = self.forward(params, x, mask)
        return calc_mi(key, mu, logvar, row_weight)
