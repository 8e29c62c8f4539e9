"""Fused vocab-projection + cross-entropy Pallas kernel.

Replaces the decoder's output stage
    ``logits = h @ W_pred; logp = log_softmax(logits); gather(logp, tgt)``
(<ref>modules/decoders/dec_lstm.py §reconstruct_error — token-summed masked
CE) with a single TPU kernel that never materializes the ``[N, V]`` logits
tensor in HBM.

Why this exists (VERDICT.md r1 "next round" #2, pallas_guide.md): at the
flagship Yahoo config the logits tensor is [B*(T-1), 20004] f32 ≈ 250 MB.
The XLA path writes it to HBM, reads it back for ``log_softmax`` (another
full normalize pass), writes ``logp``, and reads once more for the target
gather — several HBM round trips of the largest tensor in the program, on
both the training and the IW-eval paths. This kernel streams W in
``[nh, TV]`` vocab tiles held in VMEM, keeps the ``[TN, TV]`` logits block
on-chip, and maintains a *running* (max, sumexp) pair per row — the online
logsumexp of flash-attention fame — plus the target logit picked up when
its column tile streams by. HBM traffic drops to "read h once, read W once
per row tile"; nothing of size [N, V] ever exists.

The op returns per-token ``log p(tgt) = logit[tgt] − logsumexp(logits)``.
When a gradient is requested, the forward additionally spills the logits
in bf16 (1/6 the HBM cost of the f32 logits+logp pair the XLA path keeps
live between fwd and bwd). The backward is then plain XLA: softmax from
the saved (logits, lse) — no recompute matmul — an iota-compare onehot
(TPU scatters serialize), and two large MXU matmuls for dh/dW: the
``log_softmax`` VJP evaluated at the (bf16-rounded, when mxu_dtype is
bfloat16) saved logits. The forward kernel accumulates the logsumexp of
the ROUNDED logits alongside the exact one, and saves THAT as the
backward residual, so the backward's softmax rows sum to exactly 1 —
``sum_v dlogits = 0`` holds despite the rounding, at zero backward cost
(tests bound the end-to-end grad drift vs exact f32 at 5e-3). Measured
v5e @ N=3072, V=20004: fwd 2.0 ms vs 3.2 XLA; fwd+bwd 3.6 ms vs 5.0 XLA.

MXU precision: with ``mxu_dtype=bfloat16`` operands are cast to bf16 with
f32 accumulation — the same single-pass semantics as XLA's DEFAULT TPU
matmul precision, so it matches what the surrounding scan/matmul code
already does for f32 inputs. Pass ``mxu_dtype=None`` to keep full input
precision (used by the parity tests).

Correctness oracle: tests/test_pallas.py::TestFusedCE (interpret mode) —
forward, odd V (non-multiple of the tile), padded rows, and both grads vs
``jax.nn.log_softmax`` + gather.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vmem import VMEM_LIMIT_BYTES

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ce_kernel(tgt_ref, h_ref, w_ref, out_ref, lse_ref, logits_ref,
               m_scr, s_scr, tl_scr, s2_scr, *, vocab: int, block_v: int,
               n_vblocks: int, mxu_dtype):
    """Grid (row_tiles, vocab_tiles), vocab inner. Scratch carries the
    running (max, sumexp, target-logit) across the vocab sweep.

    When ``logits_ref`` is not None the block's logits are also written out
    in bf16 — the backward residual that lets the VJP skip the recompute
    matmul entirely (the bf16 write is ~1/6 the HBM cost of the f32 logits
    the XLA path materializes, and only exists when grad is needed). In
    that case ``s2_scr`` additionally accumulates the logsumexp of the
    ROUNDED logits, so the backward's softmax rows (computed from the
    residual) sum to exactly 1 with no renormalization pass of their own —
    the extra exp-sum rides the MXU-bound sweep for free."""
    j = pl.program_id(1)

    h = h_ref[:]
    w = w_ref[:]
    if mxu_dtype is not None:
        h = h.astype(mxu_dtype)
        w = w.astype(mxu_dtype)
    logits = jnp.dot(h, w, preferred_element_type=jnp.float32)  # [TN, TV]
    tn, tv = logits.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1) + j * block_v
    if logits_ref is not None:
        spill = logits.astype(logits_ref.dtype)
        logits_ref[:] = spill
        rounded = jnp.where(col < vocab, spill.astype(jnp.float32), NEG_INF)

    logits = jnp.where(col < vocab, logits, NEG_INF)  # mask the ragged tail

    tgt = tgt_ref[:]  # [TN, 1] int32
    tl_part = jnp.sum(jnp.where(col == tgt, logits, 0.0), axis=1,
                      keepdims=True)
    blk_max = jnp.max(logits, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = blk_max
        s_scr[:] = jnp.sum(jnp.exp(logits - blk_max), axis=1, keepdims=True)
        tl_scr[:] = tl_part
        if logits_ref is not None:
            s2_scr[:] = jnp.sum(jnp.exp(rounded - blk_max), axis=1,
                                keepdims=True)

    @pl.when(j > 0)
    def _accum():
        m_new = jnp.maximum(m_scr[:], blk_max)
        scale = jnp.exp(m_scr[:] - m_new)
        s_scr[:] = (s_scr[:] * scale
                    + jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True))
        if logits_ref is not None:
            s2_scr[:] = (s2_scr[:] * scale
                         + jnp.sum(jnp.exp(rounded - m_new), axis=1,
                                   keepdims=True))
        m_scr[:] = m_new
        tl_scr[:] = tl_scr[:] + tl_part

    @pl.when(j == n_vblocks - 1)
    def _finalize():
        lse = m_scr[:] + jnp.log(s_scr[:])
        out_ref[:] = tl_scr[:] - lse
        if logits_ref is None:
            lse_ref[:] = lse
        else:
            # residual lse = logsumexp of the SAVED (rounded) logits, so
            # the backward's exp(saved − lse) is an exactly-normalized
            # softmax over the real vocab columns
            lse_ref[:] = m_scr[:] + jnp.log(s2_scr[:])


def _ce_forward(h: jnp.ndarray, w: jnp.ndarray, targets: jnp.ndarray,
                block_n: int, block_v: int, mxu_dtype,
                interpret: bool, save_logits: bool):
    """h [N, nh] (N % block_n == 0, nh % 128 == 0), w [nh, V],
    targets [N] int32 → (logp_tgt [N], lse [N], logits_bf16 or None)."""
    n, nh = h.shape
    vocab = w.shape[1]
    n_rblocks = n // block_n
    n_vblocks = _cdiv(vocab, block_v)
    f32 = jnp.float32

    if mxu_dtype is not None:
        # Pre-cast the MXU operands once: halves the HBM fetch traffic of
        # the W stream (the kernel's dominant traffic) and feeds the MXU
        # its native dtype. The in-kernel cast then no-ops.
        h = h.astype(mxu_dtype)
        w = w.astype(mxu_dtype)
    kernel = functools.partial(
        _ce_kernel, vocab=vocab, block_v=block_v, n_vblocks=n_vblocks,
        mxu_dtype=mxu_dtype)
    if not save_logits:
        base = kernel
        kernel = (lambda tgt, h_, w_, out, lse, m, s, tl, s2:
                  base(tgt, h_, w_, out, lse, None, m, s, tl, s2))

    row_spec = pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [row_spec, row_spec]
    out_shape = [jax.ShapeDtypeStruct((n, 1), f32),
                 jax.ShapeDtypeStruct((n, 1), f32)]
    if save_logits:
        out_specs.append(pl.BlockSpec((block_n, block_v),
                                      lambda i, j: (i, j),
                                      memory_space=pltpu.VMEM))
        # bf16 residual matches the bf16 MXU numerics; in exact-f32 mode
        # (mxu_dtype=None, parity tests) keep the residual f32 too.
        res_dtype = jnp.bfloat16 if mxu_dtype is not None else f32
        out_shape.append(jax.ShapeDtypeStruct(
            (n, n_vblocks * block_v), res_dtype))

    flops = 2 * n * nh * vocab
    outs = pl.pallas_call(
        kernel,
        grid=(n_rblocks, n_vblocks),
        in_specs=[
            row_spec,
            pl.BlockSpec((block_n, nh), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, block_v), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((block_n, 1), f32) for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(h.size + n_rblocks * w.size) * h.dtype.itemsize,
            transcendentals=n * vocab),
        interpret=interpret,
    )(targets[:, None].astype(jnp.int32), h, w)
    logp, lse = outs[0][:, 0], outs[1][:, 0]
    return logp, lse, (outs[2] if save_logits else None)


# ------------------------------------------------------------------ op
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_ce(h, w, targets, block_n, block_v, mxu_dtype, interpret):
    logp, _, _ = _ce_forward(h, w, targets, block_n, block_v, mxu_dtype,
                             interpret, save_logits=False)
    return logp


def _fused_ce_fwd(h, w, targets, block_n, block_v, mxu_dtype, interpret):
    logp, lse, logits = _ce_forward(h, w, targets, block_n, block_v,
                                    mxu_dtype, interpret, save_logits=True)
    return logp, (h, w, targets, lse, logits)


def _fused_ce_bwd(block_n, block_v, mxu_dtype, interpret, res, g):
    """XLA backward: the exact log_softmax-gather VJP.

    Uses the bf16 logits the forward kernel spilled (1/6 the HBM cost of
    the f32 logits+logp the XLA path keeps) — no recompute matmul. The
    onehot is an iota-compare, not a scatter (TPU scatters serialize).
    dh/dW are two large MXU matmuls."""
    h, w, targets, lse, logits = res
    vocab = w.shape[1]
    col = jnp.arange(logits.shape[1], dtype=jnp.int32)[None, :]
    # `lse` is the forward kernel's logsumexp OF THE SAVED (rounded) logits
    # (s2 accumulator), so p is an exactly row-normalized softmax despite
    # the bf16 residual — sum_v dlogits = 0 holds with no extra
    # renormalization pass here (ADVICE.md round 2; an XLA-side row-sum
    # divide measured ~4% off the end-to-end train step).
    p = jnp.exp(logits.astype(jnp.float32) - lse[:, None])
    # ∂logp/∂logits = onehot − softmax, so dlogits = g·(onehot − softmax);
    # the [:, :vocab] slice below drops the kernel's padded columns.
    d = (jnp.where(col == targets[:, None], 1.0, 0.0) - p) * g[:, None]
    if mxu_dtype is not None:
        d = d.astype(mxu_dtype)
    hd = h.astype(d.dtype)
    wd = w.astype(d.dtype)
    dv = d[:, :vocab]
    dh = jax.lax.dot_general(dv, wd, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dw = jax.lax.dot_general(hd, dv, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    zt = np.zeros(targets.shape, jax.dtypes.float0)
    return dh.astype(h.dtype), dw.astype(w.dtype), zt


_fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def ce_fusable(nh: int, vocab: int) -> bool:
    """Shapes the kernel supports profitably: lane-aligned hidden dim and a
    vocab large enough that streaming it in tiles beats one XLA matmul."""
    return nh % 128 == 0 and vocab >= 1024


def fused_ce_logp(h: jnp.ndarray, w: jnp.ndarray, targets: jnp.ndarray,
                  block_n: int = 1536, block_v: int = 1024,
                  mxu_dtype: Optional[jnp.dtype] = jnp.bfloat16,
                  interpret: Optional[bool] = None) -> jnp.ndarray:
    """Per-token target log-probability without materializing logits.

    h [N, nh] hidden states, w [nh, V] output projection, targets [N]
    int32 → logp [N] f32 where logp[n] = (h[n]·w)[tgt[n]] − logsumexp(h[n]·w).

    N is padded internally to a multiple of ``block_n`` (padded rows cost
    compute but are sliced off; their grad contribution is exactly zero).
    """
    n = h.shape[0]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    block_n = min(block_n, max(8, 1 << (n - 1).bit_length()))
    n_pad = _cdiv(n, block_n) * block_n
    if n_pad != n:
        h = jnp.pad(h, ((0, n_pad - n), (0, 0)))
        targets = jnp.pad(targets, (0, n_pad - n))
    logp = _fused_ce(h, w, targets, block_n, block_v, mxu_dtype, interpret)
    return logp[:n]
