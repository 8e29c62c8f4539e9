"""Model-core tests: LSTM numerics vs torch, KL/MI/inference-dist closed
forms, masked-CE padding invariance, IW-NLL ELBO bound, generation."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_lagging_encoder_tpu.models import (
    GaussianLSTMEncoder, LSTMDecoder, VAE, calc_mi, eval_inference_dist,
    gaussian_kl, reparameterize)
from vae_lagging_encoder_tpu.models.lstm_core import lstm_run
from vae_lagging_encoder_tpu.data.vocab import BOS_ID, EOS_ID, PAD_ID

V, NI, NH, NZ, B, T = 23, 8, 16, 4, 6, 10


def tiny_vae(key=0):
    enc = GaussianLSTMEncoder(V, NI, NH, NZ)
    dec = LSTMDecoder(V, NI, NH, NZ, dropout_in=0.0, dropout_out=0.0, iw_chunk=5)
    vae = VAE(enc, dec)
    return vae, vae.init(jax.random.PRNGKey(key))


def rand_batch(rng, b=B, t=T, pad_rows=0):
    lens = rng.randint(3, t + 1, size=b)
    toks = np.full((b, t), PAD_ID, np.int32)
    mask = np.zeros((b, t), np.float32)
    for r in range(b):
        toks[r, 0] = BOS_ID
        toks[r, 1:lens[r] - 1] = rng.randint(4, V, size=lens[r] - 2)
        toks[r, lens[r] - 1] = EOS_ID
        mask[r, :lens[r]] = 1.0
    w = np.ones((b,), np.float32)
    if pad_rows:
        toks[-pad_rows:] = PAD_ID
        mask[-pad_rows:] = 0.0
        w[-pad_rows:] = 0.0
    return jnp.asarray(toks), jnp.asarray(mask), jnp.asarray(w)


# ---------------------------------------------------------------- LSTM core
def test_lstm_matches_torch():
    """Our scan cell must reproduce torch.nn.LSTM exactly (same weights).

    SURVEY.md §7 hard part 5: PyTorch-LSTM numeric parity.
    """
    import torch

    rng = np.random.RandomState(0)
    x = rng.randn(B, T, NI).astype(np.float32)
    wx = rng.uniform(-0.1, 0.1, (NI, 4 * NH)).astype(np.float32)
    wh = rng.uniform(-0.1, 0.1, (NH, 4 * NH)).astype(np.float32)
    b = rng.uniform(-0.1, 0.1, (4 * NH,)).astype(np.float32)

    outs, (hT, cT) = lstm_run({"wx": jnp.asarray(wx), "wh": jnp.asarray(wh),
                               "b": jnp.asarray(b)}, jnp.asarray(x))

    lstm = torch.nn.LSTM(NI, NH, batch_first=True)
    with torch.no_grad():
        # torch gate order (i, f, g, o) matches ours; torch stores W as [4H, in]
        lstm.weight_ih_l0.copy_(torch.from_numpy(wx.T))
        lstm.weight_hh_l0.copy_(torch.from_numpy(wh.T))
        lstm.bias_ih_l0.copy_(torch.from_numpy(b))
        lstm.bias_hh_l0.zero_()
        t_out, (t_h, t_c) = lstm(torch.from_numpy(x))

    np.testing.assert_allclose(np.asarray(outs), t_out.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(hT), t_h.numpy()[0], atol=2e-6)
    np.testing.assert_allclose(np.asarray(cT), t_c.numpy()[0], atol=2e-6)


def test_lstm_masked_carry_is_final_state():
    """Final carry with padding == final carry of the truncated sequence."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, T, NI).astype(np.float32)
    params = {"wx": jnp.asarray(rng.randn(NI, 4 * NH).astype(np.float32) * 0.1),
              "wh": jnp.asarray(rng.randn(NH, 4 * NH).astype(np.float32) * 0.1),
              "b": jnp.zeros((4 * NH,))}
    L = 6
    mask = np.zeros((2, T), np.float32)
    mask[:, :L] = 1.0
    _, (hT, cT) = lstm_run(params, jnp.asarray(x), jnp.asarray(mask))
    _, (hT2, cT2) = lstm_run(params, jnp.asarray(x[:, :L]))
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(cT2), atol=1e-6)


# ------------------------------------------------------------ Gaussian math
def test_gaussian_kl_closed_form():
    mu = jnp.asarray([[0.5, -1.0]])
    logvar = jnp.asarray([[0.0, math.log(2.0)]])
    expected = 0.5 * ((0.25 + 1 - 0 - 1) + (1.0 + 2 - math.log(2.0) - 1))
    np.testing.assert_allclose(float(gaussian_kl(mu, logvar)[0]), expected, rtol=1e-6)


def test_eval_inference_dist_vs_scipy_formula():
    rng = np.random.RandomState(2)
    mu = rng.randn(B, NZ).astype(np.float32)
    logvar = rng.randn(B, NZ).astype(np.float32) * 0.3
    z = rng.randn(B, 3, NZ).astype(np.float32)
    got = np.asarray(eval_inference_dist(jnp.asarray(z), jnp.asarray(mu),
                                         jnp.asarray(logvar)))
    var = np.exp(logvar)
    want = (-0.5 * ((z - mu[:, None]) ** 2 / var[:, None]).sum(-1)
            - 0.5 * (NZ * math.log(2 * math.pi) + logvar.sum(-1))[:, None])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mi_estimator_limits():
    # The estimator draws ONE z per x, so it carries O(1/sqrt(B)) MC noise;
    # use a big batch and tolerances a few sigma wide.
    key = jax.random.PRNGKey(0)
    NB = 1024
    # identical posteriors -> aggregate == individual -> MI ≈ 0
    mu = jnp.zeros((NB, NZ))
    logvar = jnp.zeros((NB, NZ))
    mi0 = float(calc_mi(key, mu, logvar))
    assert abs(mi0) < 0.15
    # far-apart posteriors -> MI ≈ log(B) (the estimator's upper bound)
    mu = jnp.asarray(np.random.RandomState(3).randn(NB, NZ) * 50)
    logvar = jnp.full((NB, NZ), -4.0)
    mi1 = float(calc_mi(key, mu, logvar))
    assert abs(mi1 - math.log(NB)) < 0.15
    # MI must be invariant to zero-weight pad rows
    mu_pad = jnp.concatenate([mu, jnp.full((8, NZ), 1e3)])
    lv_pad = jnp.concatenate([logvar, jnp.zeros((8, NZ))])
    w = jnp.concatenate([jnp.ones(NB), jnp.zeros(8)])
    mi2 = float(calc_mi(key, mu_pad, lv_pad, w))
    assert abs(mi2 - mi1) < 0.15


def test_mi_vs_bruteforce_numpy():
    rng = np.random.RandomState(4)
    mu = rng.randn(16, NZ).astype(np.float32)
    logvar = (rng.randn(16, NZ) * 0.2).astype(np.float32)
    key = jax.random.PRNGKey(7)
    got = float(calc_mi(key, jnp.asarray(mu), jnp.asarray(logvar)))
    # brute force with the same z draw
    z = np.asarray(reparameterize(key, jnp.asarray(mu), jnp.asarray(logvar), 1))[:, 0]
    var = np.exp(logvar)
    neg_h = np.mean(-0.5 * NZ * (1 + math.log(2 * math.pi)) - 0.5 * logvar.sum(-1))
    dens = np.zeros((16, 16))
    for i in range(16):
        for j in range(16):
            dens[i, j] = (-0.5 * ((z[i] - mu[j]) ** 2 / var[j]).sum()
                          - 0.5 * (NZ * math.log(2 * math.pi) + logvar[j].sum()))
    from scipy.special import logsumexp as lse
    want = neg_h - np.mean(lse(dens, axis=1) - math.log(16))
    np.testing.assert_allclose(got, want, rtol=1e-4)


# ------------------------------------------------------------ decoder / VAE
def test_reconstruct_error_padding_invariance():
    """Padded+bucketed batch must give the same per-sentence NLL as a
    no-padding oracle (SURVEY.md §7 hard part 2)."""
    vae, params = tiny_vae()
    rng = np.random.RandomState(5)
    toks, mask, w = rand_batch(rng)
    z = jnp.asarray(rng.randn(B, 2, NZ).astype(np.float32))
    rec = np.asarray(vae.decoder.reconstruct_error(params["dec"], toks, mask, z))
    for r in range(B):
        L = int(mask[r].sum())
        rec_r = np.asarray(vae.decoder.reconstruct_error(
            params["dec"], toks[r:r + 1, :L], mask[r:r + 1, :L], z[r:r + 1]))
        np.testing.assert_allclose(rec[r], rec_r[0], atol=1e-4)


def test_reconstruct_error_chunked_matches_unchunked():
    vae, params = tiny_vae()
    rng = np.random.RandomState(6)
    toks, mask, w = rand_batch(rng)
    z = jnp.asarray(rng.randn(B, 10, NZ).astype(np.float32))  # K=10 > iw_chunk=5
    rec_chunked = vae.decoder.reconstruct_error(params["dec"], toks, mask, z)
    vae.decoder.iw_chunk = 100  # force unchunked
    rec_full = vae.decoder.reconstruct_error(params["dec"], toks, mask, z)
    np.testing.assert_allclose(np.asarray(rec_chunked), np.asarray(rec_full),
                               atol=1e-4)


def test_chunked_dropout_keys_differ_per_chunk():
    """Train-mode chunked rec with dropout on: each z-chunk must draw its
    own dropout masks. Regression for the closure-key hazard where every
    chunk split the same base key (VERDICT.md r2 weak #4): identical z
    across chunks then yields identical per-chunk rec values, which the
    fixed per-chunk key split must break."""
    dec = LSTMDecoder(V, NI, NH, NZ, dropout_in=0.5, dropout_out=0.5,
                      iw_chunk=2)
    params = dec.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(11)
    toks, mask, _ = rand_batch(rng)
    z_one = rng.randn(B, 1, NZ).astype(np.float32)
    z = jnp.asarray(np.repeat(z_one, 6, axis=1))  # same z in all 3 chunks
    rec = np.asarray(dec.reconstruct_error(params, toks, mask, z,
                                           key=jax.random.PRNGKey(9),
                                           train=True))  # [B, 6]
    chunks = rec.reshape(B, 3, 2)
    assert not np.allclose(chunks[:, 0], chunks[:, 1]), \
        "chunks 0 and 1 share dropout masks"
    assert not np.allclose(chunks[:, 1], chunks[:, 2]), \
        "chunks 1 and 2 share dropout masks"
    # eval mode (no dropout) stays exactly chunk-invariant
    rec_eval = np.asarray(dec.reconstruct_error(params, toks, mask, z))
    np.testing.assert_allclose(rec_eval, np.broadcast_to(
        rec_eval[:, :1], rec_eval.shape), atol=1e-4)


def test_loss_pad_rows_zero():
    vae, params = tiny_vae()
    rng = np.random.RandomState(7)
    toks, mask, w = rand_batch(rng, pad_rows=2)
    loss, rec, kl = vae.loss(params, jax.random.PRNGKey(0), toks, mask, w,
                             kl_weight=1.0, train=False)
    assert np.asarray(rec)[-2:].sum() == 0
    assert np.asarray(kl)[-2:].sum() == 0


def test_nll_iw_bounded_by_elbo():
    """IW-NLL ≤ -ELBO = rec + KL (in expectation; generous slack)."""
    vae, params = tiny_vae()
    rng = np.random.RandomState(8)
    toks, mask, w = rand_batch(rng)
    _, rec, kl = vae.loss(params, jax.random.PRNGKey(1), toks, mask,
                          kl_weight=1.0, nsamples=10, train=False)
    nll = vae.nll_iw(params, jax.random.PRNGKey(2), toks, mask,
                     nsamples=50, ns=10)
    assert (np.asarray(nll) <= np.asarray(rec + kl) + 1.0).all()


def test_complete_ll_and_mi_q_shapes():
    vae, params = tiny_vae()
    rng = np.random.RandomState(9)
    toks, mask, w = rand_batch(rng)
    key = jax.random.PRNGKey(3)
    z, _ = vae.encode(params, key, toks, mask, nsamples=4)
    assert z.shape == (B, 4, NZ)
    ll = vae.eval_complete_ll(params, toks, mask, z)
    q = vae.eval_inference_dist(params, toks, mask, z)
    assert ll.shape == (B, 4) and q.shape == (B, 4)
    mi = vae.calc_mi_q(params, key, toks, mask, w)
    assert np.isfinite(float(mi))


def test_prior_kl_and_reconstruct():
    """Direct coverage for VAE.eval_prior_dist / sample_from_prior / KL /
    reconstruct (<ref>vae.py method set)."""
    from scipy.stats import multivariate_normal

    vae, params = tiny_vae()
    rng = np.random.RandomState(21)
    # eval_prior_dist == standard-normal logpdf
    z = jnp.asarray(rng.randn(5, NZ).astype(np.float32))
    ref = multivariate_normal(np.zeros(NZ), np.eye(NZ)).logpdf(np.asarray(z))
    np.testing.assert_allclose(np.asarray(vae.eval_prior_dist(z)), ref,
                               rtol=1e-5)
    # sample_from_prior: unit-Gaussian moments at large n
    zs = np.asarray(vae.sample_from_prior(jax.random.PRNGKey(0), 20_000))
    assert zs.shape == (20_000, NZ)
    assert abs(zs.mean()) < 0.02 and abs(zs.var() - 1.0) < 0.05
    # KL equals the loss()'s analytic KL term
    toks, mask, w = rand_batch(rng)
    kl = vae.KL(params, toks, mask)
    _, _, kl_from_loss = vae.loss(params, jax.random.PRNGKey(1), toks, mask,
                                  kl_weight=1.0, train=False)
    np.testing.assert_allclose(np.asarray(kl), np.asarray(kl_from_loss),
                               rtol=1e-5)
    # reconstruct: all three decoding strategies produce valid outputs
    out = np.asarray(vae.reconstruct(params, jax.random.PRNGKey(2), toks,
                                     mask, "greedy", max_len=10))
    assert out.shape == (B, 10)
    samp = np.asarray(vae.reconstruct(params, jax.random.PRNGKey(3), toks,
                                      mask, "sample", max_len=10))
    assert samp.shape == (B, 10)
    beams = vae.reconstruct(params, jax.random.PRNGKey(4), toks[:2], mask[:2],
                            "beam", max_len=8)
    assert len(beams) == 2 and all(b[0] == BOS_ID for b in beams)
    with pytest.raises(ValueError):
        vae.reconstruct(params, jax.random.PRNGKey(5), toks, mask, "nope")


def test_generation():
    vae, params = tiny_vae()
    z = jnp.asarray(np.random.RandomState(10).randn(4, NZ).astype(np.float32))
    out = np.asarray(vae.decoder.greedy_decode(params["dec"], z, max_len=12))
    assert out.shape == (4, 12)
    # after an EOS everything is PAD
    for row in out:
        hits = np.where(row == EOS_ID)[0]
        if len(hits):
            assert (row[hits[0] + 1:] == PAD_ID).all()
    samp = np.asarray(vae.decoder.sample_decode(params["dec"],
                                                jax.random.PRNGKey(4), z, 12))
    assert samp.shape == (4, 12)
    beams = vae.decoder.beam_search_decode(params["dec"], z[:2], beam_width=3,
                                           max_len=8)
    assert len(beams) == 2 and all(b[0] == BOS_ID for b in beams)


def test_posterior_mean_probes():
    enc = GaussianLSTMEncoder(V, NI, NH, 1)
    dec = LSTMDecoder(V, NI, NH, 1, dropout_in=0.0, dropout_out=0.0)
    vae = VAE(enc, dec)
    params = vae.init(jax.random.PRNGKey(11))
    rng = np.random.RandomState(12)
    toks, mask, w = rand_batch(rng, b=4)
    grid = jnp.linspace(-5, 5, 51)[:, None]
    post_mean = vae.calc_model_posterior_mean(params, toks, mask, grid)
    infer_mean = vae.calc_infer_mean(params, toks, mask)
    assert post_mean.shape == (4, 1) and infer_mean.shape == (4, 1)
    assert np.isfinite(np.asarray(post_mean)).all()


@pytest.mark.parametrize("backend", ["host", "device"])
def test_beam_search_matches_exhaustive_oracle(backend):
    """VERDICT r1 weak #7: beam search vs a tiny-vocab EXHAUSTIVE oracle.

    V=6, max_len=4: enumerate every token sequence, score complete ones
    (ending in EOS) with the beam's length-normalized total logp
    (len counts BOS..EOS inclusive), and require beam_width >= V (clamped
    internally to expand every token) to return the global argmax."""
    import itertools

    V_, NI_, NH_, NZ_, L = 6, 8, 16, 2, 4
    dec = LSTMDecoder(V_, NI_, NH_, NZ_, dropout_in=0.0, dropout_out=0.0)
    params = dec.init(jax.random.PRNGKey(3))
    # sharpen the distribution so the oracle argmax is unambiguous
    params["pred"] = params["pred"] * 40.0
    z = jnp.asarray(np.random.RandomState(8).randn(1, NZ_).astype(np.float32) * 2)

    # teacher-forced chain logps for ALL 6^k prefixes, k = 1..L
    best_score, best_seq = -np.inf, None
    for k in range(1, L + 1):
        seqs = np.array(list(itertools.product(range(V_), repeat=k)),
                        dtype=np.int32)                      # [6^k, k]
        toks_in = np.concatenate(
            [np.full((len(seqs), 1), BOS_ID, np.int32), seqs[:, :-1]], axis=1)
        logits = dec.decode(params, jnp.asarray(toks_in),
                            jnp.broadcast_to(z[:, None, :],
                                             (len(seqs), 1, NZ_)))
        logp = np.asarray(jax.nn.log_softmax(logits[:, 0], axis=-1))
        chain = logp[np.arange(len(seqs))[:, None],
                     np.arange(k)[None, :], seqs].sum(axis=1)
        done = seqs[:, -1] == EOS_ID   # complete sequences end at EOS
        if k > 1:  # no internal EOS (the beam never extends past one)
            done &= (seqs[:, :-1] != EOS_ID).all(axis=1)
        for s, sc in zip(seqs[done], chain[done]):
            norm = sc / (k + 1)        # len([BOS] + seq) like the beam
            if norm > best_score:
                best_score, best_seq = norm, [BOS_ID] + list(s)

    assert best_seq is not None, "oracle found no EOS-terminated sequence"
    got = dec.beam_search_decode(params, z, beam_width=V_, max_len=L,
                                 backend=backend)[0]
    assert got == best_seq, (got, best_seq, best_score)


def test_beam_unknown_backend_raises():
    """A backend typo must fail fast, not silently pick the ~10000x
    slower host loop."""
    dec = LSTMDecoder(6, 4, 5, 2, dropout_in=0.0, dropout_out=0.0)
    params = dec.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="backend"):
        dec.beam_search_decode(params, jnp.zeros((1, 2)), beam_width=2,
                               max_len=3, backend="devcie")


def test_topk_small_matches_lax_topk():
    """The beam search's argmax-pass top-k (3.6 -> 0.68 ms on TPU at
    [160, 20004] k=5) must equal lax.top_k exactly — values, indices, and
    tie order — including duplicate values and all(-inf) rows."""
    from vae_lagging_encoder_tpu.models.dec_lstm import _topk_small

    rng = np.random.RandomState(0)
    x = rng.randn(7, 3, 2000).astype(np.float32)
    x[0, 0, 100:110] = x[0, 0, 50]          # duplicates across positions
    x[1, 1, :] = -np.inf                    # dead-beam row
    x[2, 2, ::2] = 3.25                     # many exact ties
    xj = jnp.asarray(x)
    for k in (1, 5, 15):
        v1, i1 = _topk_small(xj, k)
        v2, i2 = jax.lax.top_k(xj, k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2), str(k))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2), str(k))
    # the fallback path (short axis / big k) is top_k itself
    v1, i1 = _topk_small(xj[..., :512], 2)
    v2, i2 = jax.lax.top_k(xj[..., :512], 2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_beam_device_matches_host():
    """The batched on-device beam search must reproduce the host loop's
    hypotheses across random models / beam widths / vocab sizes. Floating-
    point near-ties are the one tolerated divergence: the host accumulates
    beam scores in python float64, the device in f32, so hypotheses whose
    normalized scores agree to ~1e-5 may swap — in that case require the
    score gap (teacher-forced rescoring of both sequences) to be tiny."""

    def rescore(dec, params, z_row, seq):
        toks_in = jnp.asarray([seq[:-1]], dtype=jnp.int32)
        logits = dec.decode(params, toks_in,
                            jnp.broadcast_to(z_row[None, None],
                                             (1, 1, z_row.shape[-1])))
        lp = np.asarray(jax.nn.log_softmax(logits[0, 0], -1))
        return sum(float(lp[t, seq[t + 1]])
                   for t in range(len(seq) - 1)) / len(seq)

    mismatched = 0
    for seed in range(6):
        rng = np.random.RandomState(seed)
        V_ = int(rng.choice([6, 11, 30]))
        W_ = int(rng.choice([1, 2, 3, 5, V_]))
        L_ = int(rng.choice([4, 7, 12]))
        dec = LSTMDecoder(V_, 8, 16, 2, dropout_in=0.0, dropout_out=0.0)
        params = dec.init(jax.random.PRNGKey(seed))
        params["pred"] = params["pred"] * rng.choice([5.0, 20.0, 40.0])
        z = jnp.asarray(rng.randn(5, 2).astype(np.float32) * 2)
        host = dec.beam_search_decode(params, z, beam_width=W_, max_len=L_,
                                      backend="host")
        dev = dec.beam_search_decode(params, z, beam_width=W_, max_len=L_,
                                     backend="device")
        for n, (h, d) in enumerate(zip(host, dev)):
            if h == d:
                continue
            mismatched += 1
            gap = abs(rescore(dec, params, z[n], h)
                      - rescore(dec, params, z[n], d))
            assert gap < 1e-4, (seed, n, h, d, gap)
            assert d[0] == BOS_ID
    # near-ties must stay the exception, not the rule
    assert mismatched <= 3, mismatched


def test_pallas_backend_falls_back_to_scan_off_tpu():
    """backend='pallas' at kernel-eligible dims must NOT crash on the CPU
    backend outside interpret mode (regression: --jax_platform cpu runs and
    the driver's entry() compile-check on CPU) — the routing falls back to
    scan, so results are bit-identical to backend='scan'."""
    H_, B_, T_ = 128, 8, 5  # H % 128 == 0 and B % 8 == 0: kernel-eligible
    rng = np.random.RandomState(11)
    params = {"wx": jnp.asarray(rng.randn(NI, 4 * H_).astype(np.float32)) * 0.1,
              "wh": jnp.asarray(rng.randn(H_, 4 * H_).astype(np.float32)) * 0.05,
              "b": jnp.zeros((4 * H_,), jnp.float32)}
    x = jnp.asarray(rng.randn(B_, T_, NI).astype(np.float32))

    outs_p, (hT_p, cT_p) = lstm_run(params, x, backend="pallas")
    outs_s, (hT_s, cT_s) = lstm_run(params, x, backend="scan")
    np.testing.assert_array_equal(np.asarray(hT_p), np.asarray(hT_s))
    np.testing.assert_array_equal(np.asarray(cT_p), np.asarray(cT_s))
    np.testing.assert_array_equal(np.asarray(outs_p), np.asarray(outs_s))
