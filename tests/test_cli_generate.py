"""Generation-path CLI tests (VERDICT.md r2 weak #3 / missing #4).

Drives ``cli.text.main`` end-to-end with ``--sample_from_prior`` /
``--reconstruct`` (greedy + beam) on a tiny checkpoint, asserting decoded
output shape / vocab validity and ``--output_file`` writing, and the
``cli.image`` generation surface (prior-sample + reconstruction PNG grids
via the incremental PixelCNN sampler).
Parity: <ref>vae.py §sample_from_prior/§reconstruct driven from the
experiment scripts (SURVEY.md §2 drivers)."""
import os

import jax
import numpy as np
import pytest

from vae_lagging_encoder_tpu.cli import image as cli_image
from vae_lagging_encoder_tpu.cli import text as cli_text
from vae_lagging_encoder_tpu.data.synthetic import generate_synthetic_corpus
from vae_lagging_encoder_tpu.models import build_image_vae, build_text_vae
from vae_lagging_encoder_tpu.train.checkpoint import save_checkpoint, to_host


@pytest.fixture(scope="module")
def text_setup(tmp_path_factory):
    """Tiny corpus + matching (untrained) checkpoint for the synthetic cfg."""
    root = tmp_path_factory.mktemp("cligen")
    sents, _ = generate_synthetic_corpus(num_sentences=120, vocab_size=30,
                                         min_len=4, max_len=12, seed=3)
    for split, sl in {"train": slice(0, 80), "valid": slice(80, 100),
                      "test": slice(100, 120)}.items():
        with open(root / f"{split}.txt", "w") as fh:
            for s in sents[sl]:
                fh.write(" ".join(s) + "\n")
    ckpt = str(root / "m.ckpt")
    base_argv = ["--dataset", "synthetic",
                 "--train_data", str(root / "train.txt"),
                 "--val_data", str(root / "valid.txt"),
                 "--test_data", str(root / "test.txt"),
                 "--batch_size", "8",
                 "--load_path", ckpt,
                 "--exp_dir", str(root / "exp")]
    cfg, _ = cli_text.init_config(base_argv + ["--sample_from_prior"])
    from vae_lagging_encoder_tpu.data import MonoTextData
    from vae_lagging_encoder_tpu.train.loop import dataset_is_labeled

    # build the vocab exactly as generate() does (labeled parsing for the
    # built-in corpora), else the checkpoint's V drifts from the CLI's
    vocab = MonoTextData(cfg.train_data, label=dataset_is_labeled(cfg)).vocab
    vae = build_text_vae(cfg, len(vocab))
    params = vae.init(jax.random.PRNGKey(0))
    save_checkpoint(ckpt, to_host(params), {})
    return base_argv, root, vocab


def _read_lines(path):
    with open(path) as fh:
        return [ln for ln in fh.read().splitlines() if ln.strip()]


def _assert_vocab_valid(lines, vocab):
    for ln in lines:
        for w in ln.split():
            assert w in vocab.word2id, f"decoded OOV token {w!r}"


@pytest.mark.parametrize("strategy", ["greedy", "sample", "beam"])
def test_text_sample_from_prior(text_setup, strategy, tmp_path):
    base_argv, _, vocab = text_setup
    out = str(tmp_path / f"prior_{strategy}.txt")
    rc = cli_text.main(base_argv + [
        "--sample_from_prior", "--decoding_strategy", strategy,
        "--num_samples", "3", "--max_decode_len", "8",
        "--output_file", out])
    assert rc == 0
    lines = _read_lines(out)
    assert 0 < len(lines) <= 3
    _assert_vocab_valid(lines, vocab)


@pytest.mark.parametrize("strategy", ["greedy", "beam"])
def test_text_reconstruct(text_setup, strategy, tmp_path):
    base_argv, _, vocab = text_setup
    out = str(tmp_path / f"rec_{strategy}.txt")
    rc = cli_text.main(base_argv + [
        "--reconstruct", "--decoding_strategy", strategy,
        "--num_samples", "8", "--max_decode_len", "8",
        "--output_file", out])
    assert rc == 0
    lines = _read_lines(out)
    # one line per non-pad row of the first test batch (bucketed batches
    # can be partial, so the count is bounded by, not equal to, num_samples)
    assert 0 < len(lines) <= 8
    _assert_vocab_valid(lines, vocab)


def test_text_generate_requires_load_path(tmp_path):
    with pytest.raises(SystemExit):
        cli_text.main(["--dataset", "synthetic", "--sample_from_prior",
                       "--exp_dir", str(tmp_path / "e")])


# ---------------------------------------------------------------- image
def small_image_cfg(tmp_path, **kw):
    from vae_lagging_encoder_tpu.config import get_config

    base = dict(nz=4, enc_layers=(8, 12), dec_layers=3, dec_filters=12,
                dec_kernel_size=5, batch_size=8, train_data="")
    base.update(kw)
    return get_config("omniglot", **base)


class _Args:
    def __init__(self, **kw):
        self.sample_from_prior = False
        self.reconstruct = False
        self.num_samples = 2
        self.output_file = ""
        self.__dict__.update(kw)


class _Log:
    def info(self, *a, **k):
        pass


def _image_ckpt(cfg, path):
    vae = build_image_vae(cfg)
    params = vae.init(jax.random.PRNGKey(0))
    save_checkpoint(path, to_host(params), {})


def test_image_sample_from_prior_png(tmp_path):
    ckpt = str(tmp_path / "img.ckpt")
    cfg = small_image_cfg(tmp_path)
    _image_ckpt(cfg, ckpt)
    cfg = cfg.replace(load_path=ckpt)
    out = str(tmp_path / "samples.png")
    rc = cli_image.generate(cfg, _Args(sample_from_prior=True,
                                       output_file=out),
                            _Log(), str(tmp_path))
    assert rc == 0 and os.path.isfile(out)
    assert open(out, "rb").read(8).startswith(b"\x89PNG")


def test_image_reconstruct_png(tmp_path):
    ckpt = str(tmp_path / "img.ckpt")
    cfg = small_image_cfg(tmp_path)
    _image_ckpt(cfg, ckpt)
    cfg = cfg.replace(load_path=ckpt)
    out = str(tmp_path / "recon.png")
    rc = cli_image.generate(cfg, _Args(reconstruct=True, output_file=out),
                            _Log(), str(tmp_path))
    assert rc == 0 and os.path.isfile(out)
    assert open(out, "rb").read(8).startswith(b"\x89PNG")


def test_image_parser_generation_flags():
    p = cli_image.build_image_parser()
    args = p.parse_args(["--sample_from_prior", "--num_samples", "7"])
    assert args.sample_from_prior and args.num_samples == 7


def test_save_grid_layout(tmp_path):
    imgs = np.zeros((5, 4, 4, 1), np.float32)
    out = str(tmp_path / "g.png")
    cli_image.save_grid(imgs, out, ncols=3)
    assert os.path.isfile(out)


def test_save_grid_png_pixel_roundtrip(tmp_path):
    """The stdlib PNG encoder must be decodable and pixel-exact: distinct
    gray levels land in the right grid cells, borders stay white."""
    import struct
    import zlib

    imgs = np.zeros((2, 3, 3, 1), np.float32)
    imgs[0] = 0.0
    imgs[1] = 0.5
    out = str(tmp_path / "rt.png")
    cli_image.save_grid(imgs, out, ncols=2)

    blob = open(out, "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks, checking CRCs
    pos, idat, shape = 8, b"", None
    while pos < len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        payload = blob[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", blob[pos + 8 + ln:pos + 12 + ln])
        assert crc == zlib.crc32(tag + payload), tag
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", payload[:10])
            assert (depth, color) == (8, 0)  # 8-bit grayscale
            shape = (h, w)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    h, w = shape
    assert (h, w) == (1 * (3 + 2), 2 * (3 + 2))  # 1 row x 2 cols, 1px border
    raw = zlib.decompress(idat)
    rows = []
    for r in range(h):
        line = raw[r * (w + 1):(r + 1) * (w + 1)]
        assert line[0] == 0  # filter type None
        rows.append(np.frombuffer(line[1:], np.uint8))
    px = np.stack(rows)
    assert (px[1:4, 1:4] == 0).all()        # image 0: black
    assert (px[1:4, 6:9] == 128).all()      # image 1: mid-gray (round(.5*255))
    assert (px[0, :] == 255).all() and (px[:, 5] == 255).all()  # borders white
