"""Image-stack tests: masked-conv causality, PixelCNN BCE, ResNet encoder,
image pools with dynamic binarization, end-to-end omniglot smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_lagging_encoder_tpu.config import get_config
from vae_lagging_encoder_tpu.data import ImagePool
from vae_lagging_encoder_tpu.data.omniglot import load_omniglot
from vae_lagging_encoder_tpu.models import (PixelCNNDecoderV2, ResNetEncoderV2,
                                            VAE, build_image_vae)
from vae_lagging_encoder_tpu.ops.conv import causal_mask


def small_cfg(**kw):
    base = dict(nz=4, enc_layers=(8, 12), dec_layers=3, dec_filters=12,
                dec_kernel_size=5, batch_size=8, epochs=2, warm_up=1,
                iw_nsamples=10, iw_batch=10, burn_max_iters=4, burn_window=2,
                decay_epoch=1)
    base.update(kw)
    return get_config("omniglot", **base)


def small_vae(cfg=None):
    cfg = cfg or small_cfg()
    vae = build_image_vae(cfg)
    return vae, vae.init(jax.random.PRNGKey(0))


def test_causal_mask():
    m = np.asarray(causal_mask(3, 3, 1, 1, include_center=False))[:, :, 0, 0]
    np.testing.assert_array_equal(m, [[1, 1, 1], [1, 0, 0], [0, 0, 0]])
    mb = np.asarray(causal_mask(3, 3, 1, 1, include_center=True))[:, :, 0, 0]
    np.testing.assert_array_equal(mb, [[1, 1, 1], [1, 1, 0], [0, 0, 0]])


def test_pixelcnn_is_autoregressive():
    """Logit at pixel p must not depend on pixels >= p in raster order —
    checked via gradients through the full stacked model."""
    cfg = small_cfg()
    vae, params = small_vae(cfg)
    H = W = 28
    x0 = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 1) > 0.5,
                     jnp.float32)
    z = jnp.zeros((1, 1, cfg.nz))
    probe = [(0, 0), (3, 7), (14, 14), (27, 27)]
    for (pi, pj) in probe:
        def logit_at(x):
            return vae.decoder.decode(params["dec"], x, z)[0, 0, pi, pj, 0]

        g = np.asarray(jax.grad(logit_at)(x0))[0, :, :, 0]
        flat_p = pi * W + pj
        dep = np.nonzero(np.abs(g).reshape(-1) > 1e-9)[0]
        assert (dep < flat_p).all(), (pi, pj, dep[dep >= flat_p][:5])


def test_pixelcnn_bce_matches_manual():
    cfg = small_cfg()
    vae, params = small_vae(cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray((rng.rand(3, 28, 28, 1) > 0.5).astype(np.float32))
    z = jnp.asarray(rng.randn(3, 2, cfg.nz).astype(np.float32))
    rec = np.asarray(vae.decoder.reconstruct_error(params["dec"], x, None, z))
    logits = np.asarray(vae.decoder.decode(params["dec"], x, z))
    p = 1.0 / (1.0 + np.exp(-logits))
    xt = np.broadcast_to(np.asarray(x)[:, None], logits.shape)
    manual = -(xt * np.log(p + 1e-12) + (1 - xt) * np.log(1 - p + 1e-12))
    np.testing.assert_allclose(rec, manual.sum(axis=(2, 3, 4)), rtol=1e-4)


def test_pixelcnn_chunked_matches():
    cfg = small_cfg()
    vae, params = small_vae(cfg)
    rng = np.random.RandomState(2)
    x = jnp.asarray((rng.rand(2, 28, 28, 1) > 0.5).astype(np.float32))
    z = jnp.asarray(rng.randn(2, 7, cfg.nz).astype(np.float32))
    vae.decoder.iw_chunk = 3
    rec_c = vae.decoder.reconstruct_error(params["dec"], x, None, z)
    vae.decoder.iw_chunk = 100
    rec_f = vae.decoder.reconstruct_error(params["dec"], x, None, z)
    np.testing.assert_allclose(np.asarray(rec_c), np.asarray(rec_f), rtol=1e-4)


def test_resnet_encoder_shapes_and_grads():
    cfg = small_cfg()
    enc = ResNetEncoderV2(cfg.nz, channels=cfg.enc_layers)
    p = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(3).rand(5, 28, 28, 1).astype(np.float32))
    mu, logvar = enc.forward(p, x)
    assert mu.shape == (5, cfg.nz) and logvar.shape == (5, cfg.nz)
    g = jax.grad(lambda p: enc.forward(p, x)[0].sum())(p)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_pixelcnn_sampling():
    cfg = small_cfg()
    vae, params = small_vae(cfg)
    z = jnp.asarray(np.random.RandomState(4).randn(2, cfg.nz).astype(np.float32))
    img = np.asarray(vae.decoder.sample(params["dec"], jax.random.PRNGKey(0), z))
    assert img.shape == (2, 28, 28, 1)
    assert set(np.unique(img)).issubset({0.0, 1.0})


def test_incremental_sampler_matches_dense_logits():
    """The cached incremental generator (per-pixel window dots) must emit
    the SAME per-pixel logits as the dense full-canvas forward when
    teacher-forced on a fixed image — the fast-sampling correctness oracle
    (masks folded into kernels make it exact by construction)."""
    rng = np.random.RandomState(7)
    x = jnp.asarray((rng.rand(3, 28, 28, 1) > 0.5).astype(np.float32))
    for dt, atol in (("float32", 1e-5), ("bfloat16", 0.05)):
        cfg = small_cfg(compute_dtype=dt)
        vae, params = small_vae(cfg)
        z = jnp.asarray(rng.randn(3, cfg.nz).astype(np.float32))
        dec = vae.decoder
        dense = dec._logits(params["dec"], x, z)
        _, inc = dec._incremental_pixels(params["dec"], z,
                                         jax.random.PRNGKey(0), force_image=x)
        np.testing.assert_allclose(np.asarray(inc), np.asarray(dense),
                                   atol=atol, err_msg=dt)


def test_bfloat16_image_stack_matches_f32():
    """compute_dtype=bfloat16 must compile (mask/bias adds must not promote
    activations back to f32 mid-stack) and agree closely with f32 — summed
    BCE over 784 Bernoulli pixels tolerates bf16 matmul rounding well."""
    rng = np.random.RandomState(11)
    x = jnp.asarray((rng.rand(4, 28, 28, 1) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(5)
    losses = {}
    for dt in ("float32", "bfloat16"):
        vae, _ = small_vae(small_cfg(compute_dtype=dt))
        params = vae.init(jax.random.PRNGKey(0))  # f32 params either way
        loss, rec, kl = vae.loss(params, key, x, None, kl_weight=1.0,
                                 train=True)
        losses[dt] = float(loss.sum())
    assert np.isfinite(losses["bfloat16"])
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=2e-3)


def test_image_pool_and_loss():
    from vae_lagging_encoder_tpu.train import make_image_loss_fn

    cfg = small_cfg()
    train, _, _ = load_omniglot(path="", allow_synthetic=True)
    pool = ImagePool(train[:20], cfg.batch_size)
    assert pool.num_batches == 3  # 20 imgs / 8 per batch -> 3 (padded)
    vae, params = small_vae(cfg)
    loss_fn = make_image_loss_fn(vae)

    def on(*batch):
        return loss_fn(params, jax.random.PRNGKey(0), batch, 1.0)

    mean_loss, (ls, rs, ks, n, npix) = pool.switch(jnp.int32(0), jnp.int32(2), on)
    assert float(n) == 4.0  # last batch has 4 real images
    assert float(npix) == 4.0 * 784
    assert np.isfinite(float(mean_loss))


@pytest.mark.slow
def test_train_image_end_to_end(tmp_path):
    from vae_lagging_encoder_tpu.train import train_image

    cfg = small_cfg(epochs=2, aggressive=True,
                    save_path=str(tmp_path / "omni.ckpt"))
    # shrink the dataset via a pre-saved npz to keep CPU time sane
    import numpy as np
    from vae_lagging_encoder_tpu.data.omniglot import _synthetic_omniglot

    data = _synthetic_omniglot(seed=0)
    small = {k: v[:40] for k, v in data.items()}
    path = str(tmp_path / "omni.npz")
    np.savez(path, **small)
    cfg = cfg.replace(train_data=path)
    results = train_image(cfg)
    for k in ("elbo_loss", "rec", "kl", "mi", "au", "iw_nll"):
        assert k in results and np.isfinite(results[k]), k
    # eval-only reload of the checkpoint (the image --eval --load_path
    # branch; text's equivalent is covered in test_train.py). The final
    # suite and the reload both key eval binarization from cfg.seed+1 with
    # the best params, so the reload reproduces the numbers exactly.
    r2 = train_image(cfg.replace(eval=True, load_path=cfg.save_path))
    assert np.isfinite(r2["iw_nll"])
    np.testing.assert_allclose(r2["elbo_loss"], results["elbo_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(r2["iw_nll"], results["iw_nll"], rtol=1e-5)


def test_omniglot_pt_ingestion_matches_npz(tmp_path):
    """The reference ships omniglot.pt (torch.load payload) — VERDICT r1
    flagged this branch as never exercised. Save the same arrays both ways
    (dict of NCHW tensors in .pt, NHWC in .npz) and require identical
    splits from load_omniglot."""
    import torch
    from vae_lagging_encoder_tpu.data.omniglot import load_omniglot

    rng = np.random.RandomState(5)
    arrs = {k: rng.rand(n, 28, 28, 1).astype(np.float32)
            for k, n in (("train", 40), ("val", 12), ("test", 16))}
    pt = tmp_path / "omniglot.pt"
    torch.save({k: torch.from_numpy(np.transpose(v, (0, 3, 1, 2)))
                for k, v in arrs.items()}, pt)          # NCHW, torch tensors
    npz = tmp_path / "omniglot.npz"
    np.savez(npz, **arrs)                               # NHWC, numpy

    got_pt = load_omniglot(str(pt), allow_synthetic=False)
    got_npz = load_omniglot(str(npz), allow_synthetic=False)
    for a, b, want in zip(got_pt, got_npz,
                          (arrs["train"], arrs["val"], arrs["test"])):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_allclose(a, want)


def test_omniglot_pt_tuple_payload_and_disjoint_fallback(tmp_path):
    """A bare (train,)-style payload: test and val are carved from
    DISJOINT train tails (ADVICE.md r1 leakage fix) and nothing overlaps."""
    import torch
    from vae_lagging_encoder_tpu.data.omniglot import load_omniglot

    rng = np.random.RandomState(6)
    full = rng.rand(50, 784).astype(np.float32)  # flat [N, 784] form
    pt = tmp_path / "omniglot.pt"
    torch.save((torch.from_numpy(full),), pt)

    train, val, test = load_omniglot(str(pt), allow_synthetic=False)
    assert len(train) + len(val) + len(test) == 50
    flat = lambda a: {row.tobytes() for row in a.reshape(len(a), -1)}
    assert not flat(train) & flat(val)
    assert not flat(train) & flat(test)
    assert not flat(val) & flat(test)
    # reassembling the three splits in order reproduces the original
    recon = np.concatenate([train, val, test]).reshape(50, 784)
    np.testing.assert_allclose(recon, full)


def test_omniglot_synthetic_cache_is_seed_stamped(tmp_path, monkeypatch):
    """A cached substitute .npz written for one seed must not be served for
    another (code-review r3): ensure_omniglot_dataset stamps the seed and
    regenerates on mismatch; load_omniglot validates the stamp. A missing
    explicit path warns before substituting."""
    from vae_lagging_encoder_tpu.data import omniglot as og

    monkeypatch.setattr(og, "_SYNTH_SIZES",
                        {"train": 40, "val": 8, "test": 8})
    monkeypatch.setattr(og, "_SYNTH_CACHE", {})
    root = str(tmp_path)
    p1 = og.ensure_omniglot_dataset(root, seed=1)
    with np.load(p1) as z:
        assert int(z["seed"][()]) == 1
    d1 = np.load(p1)["train"]

    # same seed: reused (mtime unchanged); other seed: regenerated
    import os
    m1 = os.path.getmtime(p1)
    assert og.ensure_omniglot_dataset(root, seed=1) == p1
    assert os.path.getmtime(p1) == m1
    og.ensure_omniglot_dataset(root, seed=2)
    d2 = np.load(p1)["train"]
    assert not np.array_equal(d1, d2)

    # load_omniglot with a missing .pt path: warns, and does NOT serve the
    # seed-2 cache for the seed-1 request (falls back to generation)
    missing = os.path.join(root, "omniglot.pt")
    with pytest.warns(UserWarning, match="SYNTHETIC"):
        tr, va, te = og.load_omniglot(missing, seed=1)
    assert np.array_equal(tr, d1)
    with pytest.warns(UserWarning, match="SYNTHETIC"):
        tr2, _, _ = og.load_omniglot(missing, seed=2)
    assert np.array_equal(tr2, d2)
