"""Image experiment CLI — parity with <ref>image.py (SURVEY.md §3.4).

Usage (reference-compatible):
    python -m vae_lagging_encoder_tpu.cli.image --dataset omniglot --aggressive 1
    python -m vae_lagging_encoder_tpu.cli.image --dataset omniglot --eval \
        --load_path models/omniglot/model.ckpt
    # generation from a trained checkpoint (PNG grids via the cached
    # incremental PixelCNN sampler):
    ... --load_path ck --sample_from_prior --num_samples 50 \
        --output_file samples.png
    ... --load_path ck --reconstruct --output_file recon.png
"""
from __future__ import annotations

import json
import sys

from ..train.loop import train_image
from .common import apply_platform, build_parser, config_from_args, make_run_logger


def build_image_parser():
    p = build_parser(default_dataset="omniglot")
    p.add_argument("--sample_from_prior", action="store_true",
                   help="sample images from the prior (needs --load_path)")
    p.add_argument("--reconstruct", action="store_true",
                   help="reconstruct test images (needs --load_path)")
    p.add_argument("--num_samples", type=int, default=50)
    p.add_argument("--output_file", type=str, default="",
                   help="PNG path (default <exp_dir>/{samples,recon}.png)")
    return p


def init_config(argv=None):
    args = build_image_parser().parse_args(argv)
    apply_platform(args)
    cfg = config_from_args(args)
    if cfg.model_type != "image":
        raise SystemExit(f"--dataset {cfg.dataset} is not an image dataset; "
                         "use vae_lagging_encoder_tpu.cli.text")
    return cfg, args


def save_grid(imgs, path: str, ncols: int = 10) -> None:
    """[N, H, W, 1] images in [0,1] → one PNG grid (no matplotlib needed:
    a plain PNG write keeps the path dependency-light and byte-stable)."""
    import numpy as np

    imgs = np.asarray(imgs)
    n, h, w, _ = imgs.shape
    if n == 0:
        raise ValueError("no images to render (num_samples=0 or an empty "
                         "test split)")
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    canvas = np.ones((nrows * (h + 2), ncols * (w + 2)), np.float32)
    for i in range(n):
        r, c = divmod(i, ncols)
        canvas[r * (h + 2) + 1:r * (h + 2) + 1 + h,
               c * (w + 2) + 1:c * (w + 2) + 1 + w] = imgs[i, :, :, 0]
    _write_gray_png(path, np.round(np.clip(canvas, 0, 1) * 255).astype(np.uint8))


def _write_gray_png(path: str, gray: "np.ndarray") -> None:
    """Minimal 8-bit grayscale PNG encoder (stdlib zlib/struct only)."""
    import struct
    import zlib

    h, w = gray.shape
    raw = b"".join(b"\x00" + gray[r].tobytes() for r in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n"
                 + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
                 + chunk(b"IDAT", zlib.compress(raw, 6))
                 + chunk(b"IEND", b""))


def generate(cfg, args, log, exp_dir: str) -> int:
    """Prior sampling / test-set reconstruction → PNG grid.

    Parity: <ref>image.py driver surface over <ref>vae.py
    §sample_from_prior/§reconstruct + <ref>dec_pixelcnn_v2.py §decode
    (autoregressive pixel generation); runs the cache-based incremental
    sampler (models/dec_pixelcnn.py, 5.6× the dense per-pixel forward).
    """
    import os

    import jax
    import jax.numpy as jnp

    from ..data.omniglot import load_omniglot
    from ..models import build_image_vae
    from ..train.checkpoint import load_checkpoint

    if not cfg.load_path:
        raise SystemExit("--sample_from_prior/--reconstruct need --load_path")
    vae = build_image_vae(cfg)
    params, _ = load_checkpoint(cfg.load_path)
    params = jax.tree.map(jnp.asarray, params)
    key = jax.random.PRNGKey(cfg.seed)
    n = args.num_samples
    if args.sample_from_prior:
        k_z, k_pix = jax.random.split(key)
        z = vae.sample_from_prior(k_z, n)
        imgs = vae.decoder.sample(params["dec"], k_pix, z)
        out = args.output_file or os.path.join(exp_dir, "samples.png")
        save_grid(imgs, out)
        log.info(f"[generate] {n} prior samples -> {out}")
    else:  # reconstruct
        _, _, test_imgs = load_omniglot(cfg.train_data)
        x = jnp.asarray(test_imgs[:n])  # grayscale probabilities [N,H,W,1]
        k_bin, k_enc, k_pix = jax.random.split(key, 3)
        # dynamic binarization, as at training/eval (<ref>image.py
        # §torch.bernoulli; SURVEY.md §3.4)
        xb = jax.random.bernoulli(k_bin, x).astype(jnp.float32)
        z, _ = vae.encoder.sample(params["enc"], k_enc, xb, None, 1)
        recon = vae.decoder.sample(params["dec"], k_pix, z[:, 0, :])
        # grid interleaves COLUMNS: each original sits immediately left of
        # its reconstruction (flat order o0,r0,o1,r1,... filled row-major)
        import numpy as np

        pairs = np.stack([np.asarray(xb), np.asarray(recon)], axis=1)
        out = args.output_file or os.path.join(exp_dir, "recon.png")
        save_grid(pairs.reshape((-1,) + pairs.shape[2:]), out, ncols=10)
        log.info(f"[generate] {n} reconstructions (orig/recon interleaved) "
                 f"-> {out}")
    return 0


def main(argv=None) -> int:
    cfg, args = init_config(argv)
    with make_run_logger(cfg, "image") as log:
        log.info(f"[config] {cfg}")
        if args.sample_from_prior or args.reconstruct:
            import os

            exp_dir = os.path.dirname(log.log_path) if log.log_path else "."
            return generate(cfg, args, log, exp_dir)
        results = train_image(cfg, log)
        log.info("[results] " + json.dumps(
            {k: v for k, v in results.items() if k != "history"},
            default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
