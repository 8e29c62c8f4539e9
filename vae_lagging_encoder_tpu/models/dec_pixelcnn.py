"""Conditional PixelCNN decoder p(x|z) over binarized images.

Parity: <ref>modules/decoders/dec_pixelcnn_v2.py §PixelCNNDecoderV2
(SURVEY.md §2): masked convs — mask A (blocks current pixel) in the first
layer, mask B afterwards; z conditions every layer via a linear projection
broadcast-added to the feature map; Bernoulli logits per pixel;
``reconstruct_error`` = per-image summed BCE computed in ONE parallel
forward (training never runs sequentially); pixel-by-pixel autoregressive
``decode`` only for sampling.

TPU notes: masks are folded into weights at trace time (ops/conv.py), so
training is a stack of dense MXU convs. Sampling defaults to cache-based
incremental generation — one small window-dot per layer per pixel inside
a ``lax.fori_loop`` (arXiv:1704.06001 idea; 5.6× over the full-canvas-
per-pixel path, which remains available as ``sample(..., fast=False)``
and serves as the correctness oracle).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import masked_conv2d
from .decoder import DecoderBase
from .lstm_core import uniform


class PixelCNNDecoderV2(DecoderBase):
    def __init__(self, nz: int, img_size: Tuple[int, int, int] = (28, 28, 1),
                 n_layers: int = 8, filters: int = 64, first_kernel: int = 7,
                 kernel: int = 3, compute_dtype=jnp.float32, iw_chunk: int = 25):
        self.nz = nz
        self.img_size = img_size
        self.n_layers = n_layers
        self.filters = filters
        self.first_kernel = first_kernel
        self.kernel = kernel
        self.compute_dtype = compute_dtype
        self.iw_chunk = iw_chunk

    def init(self, key) -> Dict:
        H, W, C = self.img_size
        keys = jax.random.split(key, 2 * self.n_layers + 2)
        layers: List[Dict] = []
        cin = C
        for i in range(self.n_layers):
            k = self.first_kernel if i == 0 else self.kernel
            cout = self.filters
            layers.append({
                "w": uniform(keys[2 * i], (k, k, cin, cout), 0.05),
                "b": jnp.zeros((cout,)),
                # per-layer z conditioning: Linear(nz, cout), broadcast-added
                "wz": uniform(keys[2 * i + 1], (self.nz, cout), 0.05),
            })
            cin = cout
        return {
            "layers": layers,
            "out_w": uniform(keys[-2], (1, 1, cin, C), 0.05),
            "out_b": jnp.zeros((C,)),
        }

    # ------------------------------------------------------------------
    def _logits(self, params, x: jnp.ndarray, z_flat: jnp.ndarray) -> jnp.ndarray:
        """x [N, H, W, C] binary canvas, z_flat [N, nz] → Bernoulli logits."""
        h = x.astype(self.compute_dtype)
        for i, layer in enumerate(params["layers"]):
            cond = jnp.dot(z_flat, layer["wz"],
                           preferred_element_type=jnp.float32)
            h = masked_conv2d(h, layer["w"].astype(self.compute_dtype),
                              include_center=(i > 0))
            # bias/cond add + ELU in f32 (free — XLA fuses the casts into
            # the conv epilogue), back to compute_dtype for the next conv.
            h = jax.nn.elu(h.astype(jnp.float32) + layer["b"]
                           + cond[:, None, None, :]).astype(self.compute_dtype)
        # 1x1 output conv in f32: negligible FLOPs, keeps logits exact.
        out = masked_conv2d(h.astype(jnp.float32), params["out_w"],
                            include_center=True)
        return out + params["out_b"]

    def decode(self, params, x: jnp.ndarray, z: jnp.ndarray,
               key=None, train: bool = False) -> jnp.ndarray:
        """Teacher-forced logits: x [B,H,W,C], z [B,K,nz] → [B,K,H,W,C]."""
        del key, train  # no dropout in the reference image decoder
        B = x.shape[0]
        K = z.shape[1]
        xk = jnp.broadcast_to(x[None], (K,) + x.shape).reshape((K * B,) + x.shape[1:])
        zf = z.transpose(1, 0, 2).reshape(K * B, self.nz)
        logits = self._logits(params, xk, zf)
        return logits.reshape((K, B) + x.shape[1:]).transpose(1, 0, 2, 3, 4)

    def reconstruct_error(self, params, x: jnp.ndarray,
                          mask: Optional[jnp.ndarray], z: jnp.ndarray,
                          key=None, train: bool = False) -> jnp.ndarray:
        """-log p(x|z) per (image, z-sample): [B, K] — summed Bernoulli BCE.

        ``mask`` is unused for images (kept for the shared VAE interface).
        """
        B = x.shape[0]
        K = z.shape[1]

        def rec_chunk(z_chunk):
            k = z_chunk.shape[1]
            logits = self.decode(params, x, z_chunk)
            xt = jnp.broadcast_to(x[:, None], (B, k) + x.shape[1:])
            nll = jnp.maximum(logits, 0) - logits * xt + jnp.log1p(
                jnp.exp(-jnp.abs(logits)))  # stable BCE-with-logits
            return jnp.sum(nll, axis=(2, 3, 4))

        if K <= self.iw_chunk:
            return rec_chunk(z)
        n_chunks = -(-K // self.iw_chunk)
        K_pad = n_chunks * self.iw_chunk
        if K_pad != K:
            z = jnp.concatenate(
                [z, jnp.zeros((B, K_pad - K, self.nz), z.dtype)], axis=1)
        zc = z.reshape(B, n_chunks, self.iw_chunk, self.nz).transpose(1, 0, 2, 3)
        out = jax.lax.map(jax.checkpoint(rec_chunk), zc)
        return out.transpose(1, 0, 2).reshape(B, K_pad)[:, :K]

    def log_probability(self, params, x, mask, z) -> jnp.ndarray:
        return -self.reconstruct_error(params, x, mask, z)

    # ------------------------------------------------------------------
    def _incremental_pixels(self, params, z_flat: jnp.ndarray, key,
                            force_image: Optional[jnp.ndarray] = None):
        """Cache-based raster generation (fast PixelCNN sampling in the
        spirit of Ramachandran et al. 2017, arXiv:1704.06001): per pixel,
        compute each layer's activation only AT that pixel from a cached
        window of earlier activations, instead of a full-canvas forward.
        Exact by construction: the causal masks are folded into the
        kernels, so the (zero-initialized) not-yet-written window positions
        carry zero weight — per-pixel logits equal the dense ``_logits``.

        ``force_image`` teacher-forces the written pixels (oracle tests);
        otherwise pixels are Bernoulli samples. Returns
        ``(canvas [N,H,W,C], logits [N,H,W,C])``.
        """
        from ..ops.conv import causal_mask

        N = z_flat.shape[0]
        H, W, C = self.img_size
        L = self.n_layers
        ks = [self.first_kernel] + [self.kernel] * (L - 1)
        margins = [k // 2 for k in ks]
        cd = self.compute_dtype

        layers = params["layers"]
        kernels, conds, biases = [], [], []
        for i, (layer, k) in enumerate(zip(layers, ks)):
            kh, kw, cin, cout = layer["w"].shape
            w = layer["w"] * causal_mask(kh, kw, cin, cout,
                                         include_center=(i > 0))
            kernels.append(w.reshape(kh * kw * cin, cout).astype(cd))
            conds.append(jnp.dot(z_flat, layer["wz"],
                                 preferred_element_type=jnp.float32))
            biases.append(layer["b"])
        out_w = params["out_w"][0, 0]  # 1x1 conv, mask B keeps the center

        # canvases[l] = input to layer l, padded by that layer's margin;
        # canvases[L] = last hidden (read by the unpadded 1x1 out conv).
        widths = [C] + [self.filters] * L
        pads = margins + [0]
        canvases = tuple(
            jnp.zeros((N, H + 2 * p, W + 2 * p, c), jnp.float32)
            for p, c in zip(pads, widths))
        logits_canvas = jnp.zeros((N, H, W, C), jnp.float32)

        def body(p, carry):
            canvases, logits_canvas = carry
            i, j = p // W, p % W
            h = None
            canvases = list(canvases)
            for l in range(L):
                win = jax.lax.dynamic_slice(
                    canvases[l], (0, i, j, 0), (N, ks[l], ks[l], widths[l]))
                acc = jnp.dot(win.reshape(N, -1).astype(cd), kernels[l],
                              preferred_element_type=jnp.float32)
                # match the dense path bit-for-bit: its convs emit
                # compute_dtype outputs, so under bf16 the accumulator is
                # rounded to bf16 before the f32 bias/cond/ELU epilogue
                acc = acc.astype(cd).astype(jnp.float32)
                h = jax.nn.elu(acc + biases[l] + conds[l])
                m_next = pads[l + 1]
                canvases[l + 1] = jax.lax.dynamic_update_slice(
                    canvases[l + 1], h[:, None, None, :].astype(jnp.float32),
                    (0, i + m_next, j + m_next, 0))
            # the dense path's last hidden goes through compute_dtype before
            # the f32 1x1 out conv (_logits lines above) — round the same
            # way so fast-sampled logits match dense under bf16 too
            logit = (jnp.dot(h.astype(cd).astype(jnp.float32), out_w,
                             preferred_element_type=jnp.float32)
                     + params["out_b"])
            logits_canvas = jax.lax.dynamic_update_slice(
                logits_canvas, logit[:, None, None, :], (0, i, j, 0))
            if force_image is not None:
                pix = jax.lax.dynamic_slice(force_image, (0, i, j, 0),
                                            (N, 1, 1, C))[:, 0, 0, :]
            else:
                pix = jax.random.bernoulli(
                    jax.random.fold_in(key, p),
                    jax.nn.sigmoid(logit)).astype(jnp.float32)
            m0 = pads[0]
            canvases[0] = jax.lax.dynamic_update_slice(
                canvases[0], pix[:, None, None, :], (0, i + m0, j + m0, 0))
            return tuple(canvases), logits_canvas

        canvases, logits_canvas = jax.lax.fori_loop(
            0, H * W, body, (canvases, logits_canvas))
        m0 = pads[0]
        canvas = canvases[0][:, m0:m0 + H, m0:m0 + W, :]
        return canvas, logits_canvas

    def sample(self, params, key, z_flat: jnp.ndarray,
               fast: bool = True) -> jnp.ndarray:
        """Autoregressive pixel-by-pixel generation: z [N, nz] → binary
        images [N, H, W, C]. <ref>dec_pixelcnn_v2.py §decode.

        ``fast=True`` (default) uses the cached incremental generator
        (one small window-dot per layer per pixel); ``fast=False`` runs
        the reference-shaped full-canvas forward per pixel (the oracle)."""
        if fast:
            canvas, _ = self._incremental_pixels(params, z_flat, key)
            return canvas
        N = z_flat.shape[0]
        H, W, C = self.img_size
        canvas = jnp.zeros((N, H, W, C))

        def body(p, carry):
            canvas, key = carry
            i, j = p // W, p % W
            logits = self._logits(params, canvas, z_flat)[:, i, j, :]
            key, sub = jax.random.split(key)
            pix = jax.random.bernoulli(sub, jax.nn.sigmoid(logits)).astype(
                canvas.dtype)
            canvas = jax.lax.dynamic_update_slice(
                canvas, pix[:, None, None, :], (0, i, j, 0))
            return canvas, key

        canvas, _ = jax.lax.fori_loop(0, H * W, body, (canvas, key))
        return canvas

    # aliases for the shared VAE.reconstruct API
    def greedy_decode(self, params, z_flat, max_len: int = 0):
        return self.sample(params, jax.random.PRNGKey(0), z_flat)

    def sample_decode(self, params, key, z_flat, max_len: int = 0):
        return self.sample(params, key, z_flat)
