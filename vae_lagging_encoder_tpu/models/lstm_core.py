"""Shared LSTM machinery, TPU-first.

Replaces the reference's use of ``nn.LSTM`` (cuDNN) in
<ref>modules/encoders/enc_lstm.py and <ref>modules/decoders/dec_lstm.py.

TPU design (SURVEY.md §7 step 2 + pallas_guide.md):
- The input projection ``x @ Wx`` for the WHOLE sequence is hoisted out of
  the recurrence into one large MXU matmul ([B*T, ni] @ [ni, 4H]) — that is
  where the FLOPs are, and it tiles perfectly onto the 128x128 systolic
  array. The ``lax.scan`` body is left with only the small recurrent matmul
  ``h @ Wh`` plus fused elementwise gates (XLA fuses these into the matmul's
  epilogue).
- Variable length is handled by a *masked carry*: on padded steps the state
  is held, so the final carry is exactly the state at each row's last real
  token — the reference gets this for free from length-homogeneous batches.
- An optional Pallas path (ops/lstm_pallas.py) keeps ``Wh`` resident in VMEM
  across the whole scan instead of re-reading it from HBM every timestep.

Gate order is (i, f, g, o). The two PyTorch biases are kept as SEPARATE
parameters (b_ih, b_hh) and summed once per sequence at trace time — zero
runtime cost, but exact reference training dynamics: SGD moves both biases
by the same gradient (an effective 2x step on the merged bias) and the
global-norm clip counts the bias gradient twice, both of which a merged
bias would get wrong (verified by tests/test_torch_parity.py's grad-step
check). We match the reference's *init recipe* (<ref>text.py §model init:
uniform 0.01 for recurrent weights, uniform 0.1 for embeddings), not its
RNG stream.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def uniform(key, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


def init_lstm_params(key, input_dim: int, hidden_dim: int,
                     scale: float = 0.01) -> Dict[str, jnp.ndarray]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "wx": uniform(k1, (input_dim, 4 * hidden_dim), scale),
        "wh": uniform(k2, (hidden_dim, 4 * hidden_dim), scale),
        "b_ih": uniform(k3, (4 * hidden_dim,), scale),
        "b_hh": uniform(jax.random.fold_in(k3, 1), (4 * hidden_dim,), scale),
    }


def lstm_bias(params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Effective gate bias b_ih + b_hh (accepts legacy merged-"b" pytrees)."""
    return params["b"] if "b" in params else params["b_ih"] + params["b_hh"]


def lstm_cell(h, c, xw_t, wh, compute_dtype=jnp.float32):
    """One LSTM step given the precomputed input projection ``xw_t``."""
    gates = xw_t + jnp.dot(h.astype(compute_dtype), wh.astype(compute_dtype),
                           preferred_element_type=jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_run(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None,
             h0: Optional[jnp.ndarray] = None,
             c0: Optional[jnp.ndarray] = None,
             compute_dtype=jnp.float32,
             unroll: int = 4,
             backend: str = "scan",
             inference: bool = False) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run the LSTM over a padded batch.

    x: [B, T, input_dim]; mask: [B, T] (1 real / 0 pad) or None.
    Returns (outputs [B, T, H], (h_T, c_T)) where h_T/c_T are the carries at
    each row's final *real* token when a mask is given.

    backend="pallas" routes the recurrence through the fused VMEM-resident
    kernel (ops/lstm_pallas.py). Note: on masked PAD positions the pallas
    path emits the *kept* state where scan emits the raw step output — the
    two agree everywhere a mask is 1 and on the final carries, which is all
    any caller consumes (decoder is unmasked; encoder uses only the carry).

    inference=True marks a no-grad call: batches wider than the training
    kernel's limit (IW evaluation runs B·iw_chunk rows, SURVEY.md §3.3) go
    through the residual-free inference kernel, which shrinks its timestep
    unroll to fit the wider batch in VMEM (row-chunking was measured and
    lost to scan — RESULTS.md); widths beyond even UNROLL=1 fall back to
    scan. That path has NO VJP — gradients through it error loudly;
    callers pass inference only from no-grad eval paths.
    """
    B, T, _ = x.shape
    H = params["wh"].shape[0]
    wh = params["wh"]
    # Hoisted input projection: one big MXU matmul over the whole sequence.
    xw = (jnp.dot(x.reshape(B * T, -1).astype(compute_dtype),
                  params["wx"].astype(compute_dtype),
                  preferred_element_type=jnp.float32)
          .reshape(B, T, 4 * H) + lstm_bias(params)).transpose(1, 0, 2)  # [T, B, 4H]

    if h0 is None:
        h0 = jnp.zeros((B, H), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((B, H), jnp.float32)

    from ..ops.vmem import pallas_available

    pallas_ok = (backend == "pallas" and H % 128 == 0 and B % 8 == 0
                 and pallas_available())
    # wh must be VMEM-resident for the whole sequence; above H=512 the
    # f32 matrix (16 MB at H=1024) oversubscribes VMEM, so drop the
    # weights (only) to bf16 — accumulation stays f32.
    wh_dtype = jnp.bfloat16 if (H > 512 or compute_dtype == jnp.bfloat16) \
        else jnp.float32

    # The fused kernel wins when the recurrent matmul is tiny/latency-bound
    # (training batch sizes); its UNROLL-blocked VMEM working set (xw in +
    # gates residual out, ~U*B*4H*4 bytes each, double-buffered) caps the
    # differentiable path at B=128.
    if pallas_ok and B <= 128:
        from ..ops.lstm_pallas import lstm_seq_fused

        m = (mask.T if mask is not None
             else jnp.ones((T, B), jnp.float32))
        hs, hT, cT = lstm_seq_fused(xw, m, wh.astype(wh_dtype), h0, c0)
        return hs.transpose(1, 0, 2), (hT, cT)

    # Wide no-grad batches (IW eval): the residual-free inference kernel,
    # which shrinks its timestep unroll to fit VMEM instead of chunking —
    # wh stays VMEM-resident across the sequence where scan re-streams it
    # from HBM every timestep (measured at B=320/T=96/H=1024 on v5e:
    # 5.8 ms kernel vs 8.3 ms scan per forward).
    if pallas_ok and inference and B > 128:
        from ..ops.lstm_pallas import infer_kernel_fits, lstm_seq_fused_infer

        if infer_kernel_fits(B, H):
            m = (mask.T if mask is not None
                 else jnp.ones((T, B), jnp.float32))
            hs, hT, cT = lstm_seq_fused_infer(xw, m, wh.astype(wh_dtype),
                                              h0, c0)
            return hs.transpose(1, 0, 2), (hT, cT)
        # extreme widths (B·5H·8 bytes > VMEM even unrolled by 1) -> scan
    # (pallas requested but shapes off-tile -> fall through to the scan path)

    if mask is not None:
        m = mask.T[..., None]  # [T, B, 1]

        def step(carry, inp):
            h, c = carry
            xw_t, m_t = inp
            h_new, c_new = lstm_cell(h, c, xw_t, wh, compute_dtype)
            h_keep = m_t * h_new + (1.0 - m_t) * h
            c_keep = m_t * c_new + (1.0 - m_t) * c
            return (h_keep, c_keep), h_new

        (hT, cT), outs = jax.lax.scan(step, (h0, c0), (xw, m), unroll=unroll)
    else:
        def step(carry, xw_t):
            h, c = carry
            h_new, c_new = lstm_cell(h, c, xw_t, wh, compute_dtype)
            return (h_new, c_new), h_new

        (hT, cT), outs = jax.lax.scan(step, (h0, c0), xw, unroll=unroll)

    return outs.transpose(1, 0, 2), (hT, cT)
