from .encoder import (GaussianEncoderBase, calc_mi, eval_inference_dist,
                      gaussian_kl, reparameterize)
from .decoder import DecoderBase
from .enc_lstm import GaussianLSTMEncoder
from .enc_resnet import ResNetEncoderV2
from .dec_lstm import LSTMDecoder
from .dec_pixelcnn import PixelCNNDecoderV2
from .vae import VAE


def build_text_vae(cfg, vocab_size: int) -> VAE:
    """Flagship text model from an ExperimentConfig (Yahoo/Yelp/synthetic)."""
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    backend = "pallas" if cfg.use_pallas else "scan"
    enc = GaussianLSTMEncoder(vocab_size, cfg.ni, cfg.enc_nh, cfg.nz,
                              compute_dtype=dtype, backend=backend)
    dec = LSTMDecoder(vocab_size, cfg.ni, cfg.dec_nh, cfg.nz,
                      dropout_in=cfg.dec_dropout_in,
                      dropout_out=cfg.dec_dropout_out, compute_dtype=dtype,
                      backend=backend)
    return VAE(enc, dec)


def build_image_vae(cfg) -> VAE:
    """OmniGlot model: ResNet encoder + PixelCNN decoder (config parity:
    <ref>image.py §main model build)."""
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    enc = ResNetEncoderV2(cfg.nz, channels=cfg.enc_layers,
                          img_size=cfg.img_size, compute_dtype=dtype)
    dec = PixelCNNDecoderV2(cfg.nz, img_size=cfg.img_size,
                            n_layers=cfg.dec_layers, filters=cfg.dec_filters,
                            first_kernel=cfg.dec_kernel_size,
                            compute_dtype=dtype)
    return VAE(enc, dec)


__all__ = [
    "DecoderBase", "GaussianEncoderBase", "GaussianLSTMEncoder", "ResNetEncoderV2",
    "LSTMDecoder", "PixelCNNDecoderV2", "VAE",
    "build_text_vae", "build_image_vae", "calc_mi", "eval_inference_dist",
    "gaussian_kl", "reparameterize",
]
