"""Guards for bench.py — the driver runs it once at round end, so a
silent import/shape break there voids the recorded benchmark. These tests
cover the pieces that can rot independently of the training code: the
analytic FLOPs models (BASELINE.md's accounting), the synthetic corpus,
and the shared image-bench builder (used by BOTH bench.py's image section
and experiments/profile_trace.py's dossier capture — r5 review dedup)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def test_analytic_image_flops_matches_baseline_table():
    """BASELINE.md's image roofline quotes 68.0 GF/step at the OmniGlot
    config; the helper must keep producing that number or the committed
    dossier MFUs stop being reproducible."""
    from vae_lagging_encoder_tpu.config import get_config

    gf = bench.analytic_image_flops_per_step(get_config("omniglot")) / 1e9
    assert 67.0 < gf < 69.0, gf


def test_analytic_text_flops_positive_and_slice_consistent():
    from vae_lagging_encoder_tpu.config import get_config
    from vae_lagging_encoder_tpu.data import BucketedPool, MonoTextData

    cfg = get_config("synthetic")
    sents = [[f"w{i % 40}" for i in range(4 + j % 9)] for j in range(64)]
    data = MonoTextData(sentences=sents)
    pool = BucketedPool(data.create_data_batch(8, cfg.length_buckets))
    total, n = bench.analytic_flops(cfg, len(data.vocab), pool)
    assert total > 0 and n == pool.num_batches
    # a strict slice accounts for fewer FLOPs than the whole pool
    part, n_part = bench.analytic_flops(cfg, len(data.vocab), pool,
                                        start=0, steps=2)
    assert n_part == 2 and 0 < part < total


def test_analytic_iwnll_flops_model():
    """Forward-only IW FLOPs: decoder term scales with nsamples, encoder
    term with ceil(nsamples/ns) chunks — cross-checked by hand at tiny
    dims so bench.py's iwnll_mfu stays reproducible."""
    from vae_lagging_encoder_tpu.config import get_config
    from vae_lagging_encoder_tpu.data import BucketedPool, MonoTextData

    cfg = get_config("synthetic")
    sents = [[f"w{i % 40}" for i in range(4 + j % 9)] for j in range(64)]
    data = MonoTextData(sentences=sents)
    pool = BucketedPool(data.create_data_batch(8, cfg.length_buckets))
    V = len(data.vocab)
    positions = sum(a[0].shape[0] * a[0].shape[1] * a[0].shape[2]
                    for a in pool.arrays)
    enc_tok = 2 * (cfg.ni + cfg.enc_nh) * 4 * cfg.enc_nh
    dec_tok = 2 * ((cfg.ni + cfg.nz + cfg.dec_nh) * 4 * cfg.dec_nh
                   + cfg.dec_nh * V)
    got = bench.analytic_iwnll_flops(cfg, V, pool, nsamples=500, ns=100)
    assert got == positions * (5 * enc_tok + 500 * dec_tok)
    # one chunk when ns >= nsamples; ceil on a non-divisor
    assert (bench.analytic_iwnll_flops(cfg, V, pool, 50, 100)
            == positions * (1 * enc_tok + 50 * dec_tok))
    assert (bench.analytic_iwnll_flops(cfg, V, pool, 150, 100)
            == positions * (2 * enc_tok + 150 * dec_tok))


def test_bench_corpus_shape():
    sents = bench.build_bench_corpus()
    assert len(sents) == bench.NUM_SENTS
    lens = [len(s) for s in sents]
    assert min(lens) >= 20 and max(lens) <= 160
    # ~80-token average is what makes the corpus "Yahoo-like" (SURVEY §6)
    assert 70 < np.mean(lens) < 90


@pytest.mark.slow
def test_build_image_bench_one_epoch():
    """The shared OmniGlot harness constructs and runs one tiny fused
    epoch to a finite loss — guards the builder both bench.py and
    profile_trace.py's capture_image depend on."""
    cfg, pool, vae, params, epoch_fn, opt = bench.build_image_bench(2)
    assert pool.num_batches == 2
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)
    _, _, _, sums, _ = epoch_fn(params, opt, jax.random.PRNGKey(0),
                                jnp.float32(1.0), jnp.float32(cfg.lr),
                                order, aggressive=False)
    assert np.isfinite(float(np.asarray(sums[0])))
