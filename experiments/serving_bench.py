"""Decode/serving throughput benchmark (reproduces RESULTS.md's beam rows).

Measures, at the flagship Yahoo dims (V=20004, LSTM 512/1024, nz=32,
B=32 latents, max_len=100) on the current backend:

- greedy decode (one jitted ``lax.scan``)
- ancestral sampling (same scan, categorical draw)
- batched beam search, beam 5 (``lax.while_loop`` — the round-3 device
  implementation with argmax-pass top-k)
- optional ``--host_beam_rows N``: times the reference-style host loop on
  N rows for the speedup denominator (SLOW: ~33 s/row on this box).

Usage: ``python experiments/serving_bench.py [--host_beam_rows 1]``
Prints one human line per mode plus a JSON summary.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable as `python experiments/serving_bench.py` (the script-dir rule
# would otherwise leave the package off sys.path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host_beam_rows", type=int, default=0)
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--max_len", type=int, default=100)
    ap.add_argument("--beam", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vae_lagging_encoder_tpu.models.dec_lstm import LSTMDecoder

    V, ni, nh, nz = 20004, 512, 1024, 32
    dec = LSTMDecoder(V, ni, nh, nz, dropout_in=0.0, dropout_out=0.0)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    # distinct z per timed call: the tunneled TPU worker caches
    # identical-argument executions and reports bogus times (RESULTS.md
    # measurement-methodology note)
    zs = [jnp.asarray(rng.randn(args.rows, nz).astype(np.float32))
          for _ in range(4)]
    z = zs[0]
    out = {"backend": jax.devices()[0].platform, "rows": args.rows,
           "max_len": args.max_len}

    def timed(name, fn):
        fn(zs[0])                 # compile
        t0 = time.time()
        reps = 3
        for r in range(reps):
            fn(zs[1 + r])
        dt = (time.time() - t0) / reps
        out[name + "_ms"] = round(dt * 1e3, 1)
        out[name + "_sents_per_s"] = round(args.rows / dt, 1)
        print(f"{name:14s} {dt * 1e3:8.1f} ms / {args.rows} rows "
              f"= {args.rows / dt:7.1f} sents/s")

    # np.asarray (a real host pull), not block_until_ready: the tunneled
    # axon platform's block_until_ready returns without waiting
    timed("greedy", lambda zz: np.asarray(
        dec.greedy_decode(params, zz, max_len=args.max_len)))
    timed("sample", lambda zz: np.asarray(
        dec.sample_decode(params, jax.random.PRNGKey(2), zz,
                          max_len=args.max_len)))
    timed("beam_device", lambda zz: dec.beam_search_decode(
        params, zz, beam_width=args.beam, max_len=args.max_len))

    if args.host_beam_rows:
        n = args.host_beam_rows
        t0 = time.time()
        dec.beam_search_decode(params, z[:n], beam_width=args.beam,
                               max_len=args.max_len, backend="host")
        per_row = (time.time() - t0) / n
        out["beam_host_s_per_row"] = round(per_row, 1)
        out["beam_speedup"] = round(
            per_row * args.rows / (out["beam_device_ms"] / 1e3))
        print(f"host beam: {per_row:.1f} s/row -> device speedup "
              f"~{out['beam_speedup']}x")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
