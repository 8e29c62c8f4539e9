"""Fused LSTM sequence kernel (Pallas, TPU).

Why this exists (SURVEY.md §7 step 6, pallas_guide.md): under ``lax.scan``
XLA re-reads the recurrent weight matrix ``wh`` [H, 4H] from HBM on every
timestep — for the flagship config (H=1024, f32) that is 16 MB × T ≈ 1.6 GB
of HBM traffic per 100-token sequence per direction, and the recurrent
matmul is tiny ([B=32, H] @ [H, 4H]), so the scan is pure memory-bound. This
kernel runs the WHOLE sequence in one ``pallas_call`` with:

- ``wh`` resident in VMEM for all T steps (the grid walks t = 0..T-1; the
  block index map is constant, so the pipeline fetches it once);
- per-step inputs ``xw[t]`` (the hoisted input projection) streamed
  HBM→VMEM by the Pallas pipeline with automatic double buffering;
- the (h, c) carry living in VMEM scratch across sequential grid steps;
- the variable-length *masked carry* (lstm_core semantics) fused in.

The backward pass is a reverse-sweep Pallas kernel producing the gate-
preactivation grads ``da`` [T, B, 4H]; ``dxw = da`` falls out additively and
``dwh = h_prevᵀ @ da`` is one big XLA matmul outside the kernel (MXU-sized,
[T·B, H]ᵀ @ [T·B, 4H]) — this keeps the 16 MB f32 ``dwh`` accumulator out
of VMEM. Residuals are the (masked-carry) state sequences hs/cs plus the
gate ACTIVATIONS [T, B, 4H] saved by the forward sweep: streaming them back
(~125 us of DMA at T=96) is cheaper than the serial per-step recompute
matmul they replace (~0.5 ms), which matters because the reverse sweep's
critical path is matmul latency, not bandwidth.

Weights are fed to both kernels in ``param_dtype`` (bf16 by default so
H=1024 fits VMEM twice over; f32 accumulation via
``preferred_element_type``). Correctness vs the lax.scan oracle is tested
in interpret mode (tests/test_pallas.py) and on-device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# The Mosaic scoped-VMEM default (16 MB) is tight for H=1024: bf16 wh (8 MB)
# + double-buffered per-step streams + the reverse kernel's extra residual
# streams overflow it; v5e's physical VMEM is far larger, so raise the cap.
# 100 MB admits the training kernel up to B=64 (measured 49 MB working set
# at B=64/H=1024) and the residual-free inference kernel up to B=128.
from .vmem import VMEM_LIMIT_BYTES


def _gates(xw_t, h, wh):
    a = xw_t + jax.lax.dot_general(
        h, wh, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    i, f, g, o = jnp.split(a, 4, axis=-1)
    return (jax.nn.sigmoid(i), jax.nn.sigmoid(f), jnp.tanh(g),
            jax.nn.sigmoid(o))


# Timesteps processed per grid iteration: amortizes the per-iteration
# pipeline/bookkeeping overhead of tiny recurrent matmuls ([B, H]@[H, 4H]
# at B=32 is latency-bound, ~16 us/step measured unrolled=1). The wrapper
# pads T up to a multiple of this.
UNROLL = 8


# ---------------------------------------------------------------- forward
def _fwd_kernel(xw_ref, mask_ref, wh_ref, h0_ref, c0_ref,
                hs_ref, cs_ref, gates_ref, hT_ref, cT_ref, h_scr, c_scr):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    wh = wh_ref[:]
    h_keep = h_scr[:]
    c_keep = c_scr[:]
    H = h_keep.shape[-1]
    for u in range(UNROLL):
        h_prev, c_prev = h_keep, c_keep
        i, f, g, o = _gates(xw_ref[u], h_prev.astype(wh.dtype), wh)
        c_raw = f * c_prev + i * g
        h_raw = o * jnp.tanh(c_raw)
        # mask streams as (UNROLL, B, 128) blocks; lane-repeat up to (B, H)
        m = mask_ref[u]
        if H > 128:
            m = pltpu.repeat(m, H // 128, axis=1)
        h_keep = m * h_raw + (1.0 - m) * h_prev
        c_keep = m * c_raw + (1.0 - m) * c_prev
        hs_ref[u] = h_keep
        cs_ref[u] = c_keep
        gates_ref[u] = jnp.concatenate([i, f, g, o], axis=-1)
    h_scr[:] = h_keep
    c_scr[:] = c_keep

    @pl.when(t == T - 1)
    def _():
        hT_ref[:] = h_keep
        cT_ref[:] = c_keep


def _mask128(mask):
    T, B = mask.shape
    return jnp.broadcast_to(mask[:, :, None], (T, B, 128))


def _pad_T(x, T_pad):
    T = x.shape[0]
    if T == T_pad:
        return x
    pad = [(0, T_pad - T)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _fwd_call(xw, mask, wh, h0, c0):
    T, B, H4 = xw.shape
    H = H4 // 4
    T_pad = -(-T // UNROLL) * UNROLL
    # padding steps carry mask 0 -> state held; padded hs/cs rows unused
    xw = _pad_T(xw, T_pad)
    mask = _pad_T(_mask128(mask), T_pad)
    f32 = jnp.float32
    U = UNROLL
    hs, cs, gates, hT, cT = pl.pallas_call(
        _fwd_kernel,
        grid=(T_pad // U,),
        in_specs=[
            pl.BlockSpec((U, B, H4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            # mask pre-broadcast to lane width on the host side ([T, B, 128])
            # and streamed per block — (1, B) blocks violate the (8, 128)
            # tiling rule and dynamic sublane indexing faults the worker
            pl.BlockSpec((U, B, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, H), f32),
            jax.ShapeDtypeStruct((T_pad, B, H), f32),
            jax.ShapeDtypeStruct((T_pad, B, H4), f32),
            jax.ShapeDtypeStruct((B, H), f32),
            jax.ShapeDtypeStruct((B, H), f32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), f32), pltpu.VMEM((B, H), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(xw, mask, wh, h0, c0)
    return hs[:T], cs[:T], gates[:T], hT, cT


# ------------------------------------------------------------- inference
def _infer_kernel(xw_ref, mask_ref, wh_ref, h0_ref, c0_ref,
                  hs_ref, hT_ref, cT_ref, h_scr, c_scr, *, unroll: int):
    """Forward-only variant: no cs/gates residual outputs. Used on the
    no-grad evaluation paths (IW-NLL is the repo's most FLOPs-heavy path,
    SURVEY.md §3.3) where the training kernel's residual streams would
    waste 5H of output bandwidth per step and overflow VMEM at IW widths."""
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    wh = wh_ref[:]
    h_keep = h_scr[:]
    c_keep = c_scr[:]
    H = h_keep.shape[-1]
    for u in range(unroll):
        h_prev, c_prev = h_keep, c_keep
        i, f, g, o = _gates(xw_ref[u], h_prev.astype(wh.dtype), wh)
        c_raw = f * c_prev + i * g
        h_raw = o * jnp.tanh(c_raw)
        m = mask_ref[u]
        if H > 128:
            m = pltpu.repeat(m, H // 128, axis=1)
        h_keep = m * h_raw + (1.0 - m) * h_prev
        c_keep = m * c_raw + (1.0 - m) * c_prev
        hs_ref[u] = h_keep
    h_scr[:] = h_keep
    c_scr[:] = c_keep

    @pl.when(t == T - 1)
    def _():
        hT_ref[:] = h_keep
        cT_ref[:] = c_keep


def _infer_unroll(B: int, H: int) -> int:
    """Largest timestep unroll whose double-buffered per-step streams
    (xw in, hs out ≈ U·B·5H·4 bytes ·2) fit a ~48 MB budget alongside the
    VMEM-resident wh — wide IW-eval batches shrink the unroll instead of
    overflowing VMEM (measured at B=320/H=1024: U=2 → 5.8 ms vs 8.3 ms
    scan per T=96 forward on v5e). Returns 0 when even U=1 cannot fit
    (B·H beyond ~600k rows·lanes) — callers must fall back to scan."""
    budget = 48 * 1024 * 1024
    for u in (8, 4, 2, 1):
        if u * B * 5 * H * 4 * 2 <= budget:
            return u
    return 0


def infer_kernel_fits(B: int, H: int) -> bool:
    return _infer_unroll(B, H) > 0


def lstm_seq_fused_infer(xw, mask, wh, h0, c0):
    """Forward-only fused LSTM (same contract as ``lstm_seq_fused`` but
    with NO residuals and NO VJP — taking a gradient through it errors
    loudly). Returns (hs [T, B, H], hT, cT)."""
    T, B, H4 = xw.shape
    H = H4 // 4
    U = _infer_unroll(B, H)
    if U == 0:
        raise ValueError(
            f"lstm_seq_fused_infer: B={B}, H={H} exceeds the VMEM budget "
            f"even at unroll=1 (needs B*5H*8 <= {48 * 1024 * 1024} bytes); "
            "gate calls with infer_kernel_fits(B, H) and fall back to scan")
    T_pad = -(-T // U) * U
    xw = _pad_T(xw, T_pad)
    mask = _pad_T(_mask128(mask), T_pad)
    f32 = jnp.float32
    hs, hT, cT = pl.pallas_call(
        functools.partial(_infer_kernel, unroll=U),
        grid=(T_pad // U,),
        in_specs=[
            pl.BlockSpec((U, B, H4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, B, H), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, H), f32),
            jax.ShapeDtypeStruct((B, H), f32),
            jax.ShapeDtypeStruct((B, H), f32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), f32), pltpu.VMEM((B, H), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(xw, mask, wh, h0, c0)
    return hs[:T], hT, cT


# ---------------------------------------------------------------- backward
def _bwd_kernel(gates_ref, mask_ref, wh_ref, cprev_ref,
                dhs_ref, dhT_ref, dcT_ref,
                da_ref, dh0_ref, dc0_ref, dh_scr, dc_scr):
    t = pl.program_id(0)          # 0..G-1, walking REVERSED time blocks
    G = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        dh_scr[:] = dhT_ref[:]
        dc_scr[:] = dcT_ref[:]

    wh = wh_ref[:]
    H = dh_scr.shape[-1]
    dh_c = dh_scr[:]
    dc_c = dc_scr[:]
    for u in reversed(range(UNROLL)):
        c_prev = cprev_ref[u]
        acts = gates_ref[u]
        i, f, g, o = jnp.split(acts, 4, axis=-1)
        c_raw = f * c_prev + i * g
        tanh_c = jnp.tanh(c_raw)

        dhk = dh_c + dhs_ref[u]
        dck = dc_c
        m = mask_ref[u]
        if H > 128:
            m = pltpu.repeat(m, H // 128, axis=1)
        dh_raw = m * dhk
        dc_raw = m * dck

        do = dh_raw * tanh_c
        dc_tot = dc_raw + dh_raw * o * (1.0 - tanh_c * tanh_c)
        di = dc_tot * g
        df = dc_tot * c_prev
        dg = dc_tot * i
        da = jnp.concatenate([
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ], axis=-1)
        da_ref[u] = da

        # grads flowing to the previous step's kept state
        dh_gates = jax.lax.dot_general(
            da.astype(wh.dtype), wh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh_c = dh_gates + (1.0 - m) * dhk
        dc_c = dc_tot * f + (1.0 - m) * dck
    dh_scr[:] = dh_c
    dc_scr[:] = dc_c

    @pl.when(t == G - 1)
    def _():
        dh0_ref[:] = dh_c
        dc0_ref[:] = dc_c


def _bwd_call(gates, mask, wh, c_prev_seq, dhs, dhT, dcT):
    T, B, H4 = gates.shape
    H = H4 // 4
    T_pad = -(-T // UNROLL) * UNROLL
    gates = _pad_T(gates, T_pad)
    mask = _pad_T(_mask128(mask), T_pad)
    c_prev_seq = _pad_T(c_prev_seq, T_pad)
    dhs = _pad_T(dhs, T_pad)
    f32 = jnp.float32
    U = UNROLL
    G = T_pad // U
    rev = lambda t: (G - 1 - t, 0, 0)
    const = lambda t: (0, 0)
    da, dh0, dc0 = pl.pallas_call(
        _bwd_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((U, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, 128), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((U, B, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, H4), f32),
            jax.ShapeDtypeStruct((B, H), f32),
            jax.ShapeDtypeStruct((B, H), f32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), f32), pltpu.VMEM((B, H), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(gates, mask, wh, c_prev_seq, dhs, dhT, dcT)
    return da[:T], dh0, dc0


# ---------------------------------------------------------------- public op
@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_seq_fused(xw: jnp.ndarray, mask: jnp.ndarray, wh: jnp.ndarray,
                   h0: jnp.ndarray, c0: jnp.ndarray):
    """Run an LSTM over a whole sequence in one fused TPU kernel.

    xw [T, B, 4H] — input projection incl. bias (hoisted MXU matmul);
    mask [T, B] — 1.0 real / 0.0 pad (masked carry, lstm_core semantics);
    wh [H, 4H] — recurrent weights (cast to the kernel dtype by the caller);
    h0, c0 [B, H].
    Returns (hs [T, B, H], hT [B, H], cT [B, H]) — hs are the kept states.
    """
    hs, _, _, hT, cT = _fwd_call(xw, mask, wh, h0, c0)
    return hs, hT, cT


def _fused_fwd(xw, mask, wh, h0, c0):
    hs, cs, gates, hT, cT = _fwd_call(xw, mask, wh, h0, c0)
    return (hs, hT, cT), (mask, wh, h0, c0, hs, cs, gates)


def _fused_bwd(res, cts):
    mask, wh, h0, c0, hs, cs, gates = res
    dhs, dhT, dcT = cts
    h_prev_seq = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    c_prev_seq = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    zero = jnp.zeros_like(h0)
    da, dh0, dc0 = _bwd_call(
        gates, mask, wh, c_prev_seq,
        jnp.zeros_like(hs) if dhs is None else dhs,
        zero if dhT is None else dhT,
        zero if dcT is None else dcT)
    # dwh as ONE MXU matmul outside the kernel: [H, T*B] @ [T*B, 4H]
    H = wh.shape[0]
    dwh = jax.lax.dot_general(
        h_prev_seq.reshape(-1, H), da.reshape(-1, wh.shape[1]),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wh.dtype)
    return da, None, dwh, dh0, dc0


lstm_seq_fused.defvjp(_fused_fwd, _fused_bwd)
