"""LSTM sentence encoder with Gaussian posterior head.

Parity: <ref>modules/encoders/enc_lstm.py §GaussianLSTMEncoder —
Embedding(V, ni) → 1-layer unidirectional LSTM(ni, enc_nh) → final hidden
state → Linear(enc_nh, 2*nz, bias=False) → (mu, logvar); uniform param init
(SURVEY.md §2). The final hidden state under padding is recovered by
lstm_core's masked carry.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .encoder import GaussianEncoderBase
from .lstm_core import init_lstm_params, lstm_run, uniform


class GaussianLSTMEncoder(GaussianEncoderBase):
    def __init__(self, vocab_size: int, ni: int, nh: int, nz: int,
                 compute_dtype=jnp.float32, backend: str = "scan"):
        self.vocab_size = vocab_size
        self.ni = ni
        self.nh = nh
        self.nz = nz
        self.compute_dtype = compute_dtype
        self.backend = backend

    def init(self, key) -> Dict:
        k_emb, k_lstm, k_lin = jax.random.split(key, 3)
        return {
            # <ref>text.py §model init: embeddings U(-0.1, 0.1)
            "emb": uniform(k_emb, (self.vocab_size, self.ni), 0.1),
            "lstm": init_lstm_params(k_lstm, self.ni, self.nh, 0.01),
            # Linear(enc_nh, 2*nz, bias=False)
            "linear": uniform(k_lin, (self.nh, 2 * self.nz), 0.01),
        }

    def forward(self, params: Dict, tokens: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tokens int32 [B, T] (full sentence incl. <s>/<\\/s>) → (mu, logvar)."""
        x = params["emb"][tokens]  # [B, T, ni]
        _, (h_final, _) = lstm_run(params["lstm"], x, mask,
                                   compute_dtype=self.compute_dtype,
                                   backend=self.backend)
        stats = jnp.dot(h_final, params["linear"],
                        preferred_element_type=jnp.float32)
        mu, logvar = jnp.split(stats, 2, axis=-1)
        # overflow guard; see enc_resnet.py — inert for healthy posteriors
        return mu, jnp.clip(logvar, -8.0, 8.0)
