from .encoder import (GaussianEncoderBase, calc_mi, eval_inference_dist,
                      gaussian_kl, reparameterize)
from .enc_lstm import GaussianLSTMEncoder
from .dec_lstm import LSTMDecoder
from .vae import VAE


def build_text_vae(cfg, vocab_size: int) -> VAE:
    """Flagship text model from an ExperimentConfig (Yahoo/Yelp/synthetic)."""
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    enc = GaussianLSTMEncoder(vocab_size, cfg.ni, cfg.enc_nh, cfg.nz,
                              compute_dtype=dtype)
    dec = LSTMDecoder(vocab_size, cfg.ni, cfg.dec_nh, cfg.nz,
                      dropout_in=cfg.dec_dropout_in,
                      dropout_out=cfg.dec_dropout_out, compute_dtype=dtype)
    return VAE(enc, dec)


__all__ = [
    "GaussianEncoderBase", "GaussianLSTMEncoder", "LSTMDecoder", "VAE",
    "build_text_vae", "calc_mi", "eval_inference_dist", "gaussian_kl",
    "reparameterize",
]
