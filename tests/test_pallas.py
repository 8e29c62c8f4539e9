"""Fused Pallas LSTM kernel vs the lax.scan oracle (interpret mode on CPU).

SURVEY.md §4/§7: every Pallas kernel ships with its pure-JAX reference as
the correctness oracle — forward outputs, final carries, and ALL gradients
(dxw, dwh, dh0, dc0), masked and unmasked.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vae_lagging_encoder_tpu.models.lstm_core import lstm_run
from vae_lagging_encoder_tpu.ops.lstm_pallas import lstm_seq_fused

# Interpret-mode Pallas is the other long tail of the default run (each
# kernel test simulates the grid on CPU): kernel oracles stay in the full
# `pytest tests/` run; the fast default is `pytest -m "not slow"`.
pytestmark = pytest.mark.slow

B, T, H = 8, 12, 128  # H aligned to the TPU lane width


def make_inputs(seed=0, masked=True):
    rng = np.random.RandomState(seed)
    xw = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32) * 0.3)
    wh = jnp.asarray(rng.uniform(-0.08, 0.08, (H, 4 * H)).astype(np.float32))
    h0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)
    if masked:
        lens = rng.randint(3, T + 1, size=B)
        mask = (np.arange(T)[:, None] < lens[None, :]).astype(np.float32)
    else:
        mask = np.ones((T, B), np.float32)
    return xw, jnp.asarray(mask), wh, h0, c0


def scan_oracle(xw, mask, wh, h0, c0):
    """lax.scan reference with KEPT-state outputs (pallas semantics)."""
    def step(carry, inp):
        h, c = carry
        xw_t, m_t = inp
        gates = xw_t + h @ wh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_raw = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_raw = jax.nn.sigmoid(o) * jnp.tanh(c_raw)
        m = m_t[:, None]
        h_k = m * h_raw + (1 - m) * h
        c_k = m * c_raw + (1 - m) * c
        return (h_k, c_k), h_k

    (hT, cT), hs = jax.lax.scan(step, (h0, c0), (xw, mask))
    return hs, hT, cT


@pytest.fixture(autouse=True)
def interpret_mode():
    """Run pallas kernels in interpreter mode on CPU."""
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("masked", [False, True])
def test_fused_forward_matches_scan(masked):
    xw, mask, wh, h0, c0 = make_inputs(masked=masked)
    hs_p, hT_p, cT_p = lstm_seq_fused(xw, mask, wh, h0, c0)
    hs_s, hT_s, cT_s = scan_oracle(xw, mask, wh, h0, c0)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hT_p), np.asarray(hT_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cT_p), np.asarray(cT_s), atol=2e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_fused_grads_match_scan(masked):
    xw, mask, wh, h0, c0 = make_inputs(seed=1, masked=masked)
    tgt_hs = jnp.asarray(np.random.RandomState(2).randn(T, B, H) * 0.1)
    tgt_h = jnp.asarray(np.random.RandomState(3).randn(B, H) * 0.1)

    def loss_pallas(xw, wh, h0, c0):
        hs, hT, cT = lstm_seq_fused(xw, mask, wh, h0, c0)
        return (jnp.sum(hs * tgt_hs) + jnp.sum(hT * tgt_h)
                + 0.5 * jnp.sum(cT * tgt_h))

    def loss_scan(xw, wh, h0, c0):
        hs, hT, cT = scan_oracle(xw, mask, wh, h0, c0)
        return (jnp.sum(hs * tgt_hs) + jnp.sum(hT * tgt_h)
                + 0.5 * jnp.sum(cT * tgt_h))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(xw, wh, h0, c0)
    gs = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(xw, wh, h0, c0)
    for a, b, name in zip(gp, gs, ("dxw", "dwh", "dh0", "dc0")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   rtol=1e-3, err_msg=name)


def test_lstm_run_pallas_backend_matches_scan_backend():
    """End-to-end through lstm_run: outputs at real positions + final carry."""
    rng = np.random.RandomState(4)
    params = {"wx": jnp.asarray(rng.uniform(-0.1, 0.1, (32, 4 * H)).astype(np.float32)),
              "wh": jnp.asarray(rng.uniform(-0.08, 0.08, (H, 4 * H)).astype(np.float32)),
              "b": jnp.asarray(rng.uniform(-0.1, 0.1, (4 * H,)).astype(np.float32))}
    x = jnp.asarray(rng.randn(B, T, 32).astype(np.float32))
    lens = rng.randint(3, T + 1, size=B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))

    outs_s, (hT_s, cT_s) = lstm_run(params, x, mask, backend="scan")
    outs_p, (hT_p, cT_p) = lstm_run(params, x, mask, backend="pallas")
    np.testing.assert_allclose(np.asarray(hT_p), np.asarray(hT_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cT_p), np.asarray(cT_s), atol=2e-5)
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(outs_p) * m, np.asarray(outs_s) * m,
                               atol=2e-5)


# ---------------------------------------------------------------- fused CE
class TestFusedCE:
    """ops/ce_pallas.py vs the log_softmax+gather oracle.

    Covers: ragged vocab (V not a tile multiple), padded rows (N not a
    block multiple), masked grads for h AND the projection, and the bf16
    MXU mode's drift bound.
    """

    @staticmethod
    def _inputs(n=100, nh=128, vocab=1234, seed=0):
        from vae_lagging_encoder_tpu.ops.ce_pallas import fused_ce_logp
        rng = np.random.RandomState(seed)
        h = jnp.asarray(rng.randn(n, nh).astype(np.float32) * 0.4)
        w = jnp.asarray(rng.randn(nh, vocab).astype(np.float32) * 0.05)
        tgt = jnp.asarray(rng.randint(0, vocab, n).astype(np.int32))
        mask = jnp.asarray((rng.rand(n) > 0.3).astype(np.float32))
        return fused_ce_logp, h, w, tgt, mask

    @staticmethod
    def _oracle(h, w, tgt):
        logits = jnp.dot(h, w, preferred_element_type=jnp.float32)
        return jax.nn.log_softmax(logits, -1)[jnp.arange(h.shape[0]), tgt]

    @pytest.mark.parametrize("n,vocab", [(100, 1234), (512, 2048), (8, 4097)])
    def test_forward_matches_log_softmax_gather(self, n, vocab):
        op, h, w, tgt, _ = self._inputs(n=n, vocab=vocab)
        got = op(h, w, tgt, mxu_dtype=None)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(self._oracle(h, w, tgt)),
                                   atol=1e-5, rtol=1e-5)

    def test_grads_match_log_softmax_vjp(self):
        op, h, w, tgt, mask = self._inputs()

        def loss_kernel(h, w):
            return -jnp.sum(op(h, w, tgt, mxu_dtype=None) * mask)

        def loss_oracle(h, w):
            return -jnp.sum(self._oracle(h, w, tgt) * mask)

        gk = jax.grad(loss_kernel, (0, 1))(h, w)
        go = jax.grad(loss_oracle, (0, 1))(h, w)
        np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(go[0]),
                                   atol=1e-5, rtol=1e-4, err_msg="dh")
        np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(go[1]),
                                   atol=1e-4, rtol=1e-4, err_msg="dw")

    def test_bf16_mxu_mode_bounded_drift(self):
        """bf16 operands / f32 accumulation (XLA DEFAULT-precision
        equivalent): per-token drift stays under ~5e-2 at yahoo-like
        logit magnitudes."""
        op, h, w, tgt, _ = self._inputs(n=256, nh=256, vocab=2048, seed=3)
        got = op(h, w, tgt, mxu_dtype=jnp.bfloat16)
        drift = np.max(np.abs(np.asarray(got)
                              - np.asarray(self._oracle(h, w, tgt))))
        assert drift < 5e-2, drift

    def test_decoder_fused_path_matches_xla_path(self):
        """LSTMDecoder.reconstruct_error: backend='pallas' (fused CE +
        fused LSTM, interpret) vs backend='scan' (XLA log_softmax)."""
        from vae_lagging_encoder_tpu.models.dec_lstm import LSTMDecoder
        rng = np.random.RandomState(7)
        B_, T_, V_, K_ = 8, 10, 1100, 3
        mk = lambda b: LSTMDecoder(V_, ni=16, nh=128, nz=4, dropout_in=0.0,
                                   dropout_out=0.0, backend=b)
        dec_s, dec_p = mk("scan"), mk("pallas")
        params = dec_s.init(jax.random.PRNGKey(0))
        tokens = jnp.asarray(rng.randint(0, V_, (B_, T_)).astype(np.int32))
        lens = rng.randint(3, T_ + 1, size=B_)
        mask = jnp.asarray((np.arange(T_)[None, :] < lens[:, None])
                           .astype(np.float32))
        z = jnp.asarray(rng.randn(B_, K_, 4).astype(np.float32))
        rs = dec_s.reconstruct_error(params, tokens, mask, z)
        rp = dec_p.reconstruct_error(params, tokens, mask, z)
        np.testing.assert_allclose(np.asarray(rp), np.asarray(rs),
                                   atol=2e-3, rtol=1e-4)

        gs = jax.grad(lambda p: jnp.sum(
            dec_s.reconstruct_error(p, tokens, mask, z)))(params)
        gp = jax.grad(lambda p: jnp.sum(
            dec_p.reconstruct_error(p, tokens, mask, z)))(params)
        def check(path, vs, vp):
            np.testing.assert_allclose(np.asarray(vp), np.asarray(vs),
                                       atol=5e-3, rtol=1e-3,
                                       err_msg=jax.tree_util.keystr(path))

        jax.tree_util.tree_map_with_path(check, gs, gp)


def test_wide_batch_inference_routing_matches_scan():
    """B > 128 no-grad calls route through the inference kernel
    (ops/lstm_pallas.py::lstm_seq_fused_infer, which shrinks its timestep
    unroll to fit wide batches in VMEM) — outputs and final carries must
    match the scan path, including when T needs padding to the unroll."""
    rng = np.random.RandomState(9)
    B_, T_, NI_ = 136, 12, 24
    params = {"wx": jnp.asarray(rng.uniform(-0.1, 0.1, (NI_, 4 * H)).astype(np.float32)),
              "wh": jnp.asarray(rng.uniform(-0.08, 0.08, (H, 4 * H)).astype(np.float32)),
              "b_ih": jnp.asarray(rng.uniform(-0.1, 0.1, (4 * H,)).astype(np.float32)),
              "b_hh": jnp.asarray(rng.uniform(-0.1, 0.1, (4 * H,)).astype(np.float32))}
    x = jnp.asarray(rng.randn(B_, T_, NI_).astype(np.float32))
    lens = rng.randint(3, T_ + 1, size=B_)
    mask = jnp.asarray((np.arange(T_)[None, :] < lens[:, None]).astype(np.float32))

    outs_s, (hT_s, cT_s) = lstm_run(params, x, mask, backend="scan")
    outs_p, (hT_p, cT_p) = lstm_run(params, x, mask, backend="pallas",
                                    inference=True)
    np.testing.assert_allclose(np.asarray(hT_p), np.asarray(hT_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cT_p), np.asarray(cT_s), atol=2e-5)
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(outs_p) * m, np.asarray(outs_s) * m,
                               atol=2e-5)
