"""Decoder interface p(x|z).

Parity: <ref>modules/decoders/decoder.py §DecoderBase — the abstract
conditional-likelihood interface (decode, reconstruct_error,
log_probability, beam_search_decode; SURVEY.md §2). Both concrete decoders
(LSTMDecoder for text, PixelCNNDecoderV2 for images) implement this
surface; the VAE core talks only to it.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


class DecoderBase:
    """Abstract conditional decoder; all methods are pure in (params, ...)."""

    def init(self, key) -> dict:
        raise NotImplementedError

    def decode(self, params, x_in: jnp.ndarray, z: jnp.ndarray,
               key=None, train: bool = False) -> jnp.ndarray:
        """Teacher-forced logits for x given z [B, K, nz]."""
        raise NotImplementedError

    def reconstruct_error(self, params, x: jnp.ndarray,
                          mask: Optional[jnp.ndarray], z: jnp.ndarray,
                          key=None, train: bool = False) -> jnp.ndarray:
        """-log p(x|z) per (item, z-sample): [B, K]."""
        raise NotImplementedError

    def log_probability(self, params, x, mask, z) -> jnp.ndarray:
        """log p(x|z): [B, K]."""
        return -self.reconstruct_error(params, x, mask, z)

    def beam_search_decode(self, params, z, beam_width: int = 5,
                           max_len: int = 100):
        raise NotImplementedError(
            f"{type(self).__name__} does not implement beam search")
