"""Convolution primitives for the image models (XLA convs, NHWC).

TPU note: ``lax.conv_general_dilated`` lowers straight onto the MXU; the
autoregressive masks are constant 0/1 tensors multiplied into the weights
at trace time, so XLA folds them and the masked conv costs the same as a
dense conv.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding: str = "SAME") -> jnp.ndarray:
    return lax.conv_general_dilated(x, w, (stride, stride), padding,
                                    dimension_numbers=_DN)


def causal_mask(kh: int, kw: int, cin: int, cout: int,
                include_center: bool) -> jnp.ndarray:
    """PixelCNN raster-order mask for a HWIO kernel.

    Mask A (first layer, ``include_center=False``) blocks the current pixel;
    mask B (later layers) allows it — parity with the reference's
    MaskedConv2d scheme (<ref>modules/decoders/dec_pixelcnn_v2.py §masked
    conv, SURVEY.md §2; single-channel images, so no intra-pixel channel
    ordering is needed).
    """
    m = jnp.zeros((kh, kw, 1, 1))
    ch, cw = kh // 2, kw // 2
    m = m.at[:ch].set(1.0)                      # rows strictly above
    m = m.at[ch, :cw].set(1.0)                  # same row, left of center
    if include_center:
        m = m.at[ch, cw].set(1.0)
    return jnp.broadcast_to(m, (kh, kw, cin, cout))


def masked_conv2d(x: jnp.ndarray, w: jnp.ndarray,
                  include_center: bool) -> jnp.ndarray:
    kh, kw, cin, cout = w.shape
    mask = causal_mask(kh, kw, cin, cout, include_center).astype(w.dtype)
    return conv2d(x, w * mask)
