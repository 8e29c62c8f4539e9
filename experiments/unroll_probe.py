"""Probe: does unrolling the fused-epoch loop cut the carry-copy bucket?

The round-4 profiler dossier (plot_data/profile_r4/DOSSIER.md) found
~15% of plain-step device time in copies/DMA, attributed to while-loop
carry double-buffering of the ~54 MB param carry. With static bounds the
epoch fori_loop lowers to lax.scan, where ``unroll=k`` packs k training
steps into one loop body — the carry then crosses the loop boundary once
per k steps. This probe times the SAME bench.py corpus + flagship yahoo
config at several unroll factors on the real chip.

Usage: python experiments/unroll_probe.py [unroll ...]   (default 1 2 4)
Prints one JSON line per factor: steps/s (best of two 3-epoch windows,
bench.py's stall-resistance protocol) + compile seconds.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")
from bench import BATCH, build_bench_corpus  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vae_lagging_encoder_tpu.config import get_config  # noqa: E402
from vae_lagging_encoder_tpu.data import BucketedPool, MonoTextData  # noqa: E402
from vae_lagging_encoder_tpu.models import build_text_vae  # noqa: E402
from vae_lagging_encoder_tpu.train import make_train_epoch  # noqa: E402


def time_unroll(unroll: int, sents, use_pallas: bool = True) -> dict:
    cfg = get_config("yahoo", use_pallas=use_pallas, loop_unroll=unroll)
    data = MonoTextData(sentences=sents)
    pool = BucketedPool(data.create_data_batch(BATCH, cfg.length_buckets))
    vae = build_text_vae(cfg, len(data.vocab))
    params = vae.init(jax.random.PRNGKey(cfg.seed))
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    opt_state = opt_init(params)
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)

    def run_epoch(params, opt_state, kl_w, seed):
        params, opt_state, kl_w, sums, _ = epoch_fn(
            params, opt_state, jax.random.PRNGKey(seed), kl_w,
            jnp.float32(1.0), order, aggressive=False)
        # real host pull (verify-skill trap #2): block_until_ready can
        # return without waiting over the tunnel — this probe's first
        # unroll=4 run reported 271k "steps/s" exactly that way
        np.asarray(sums)
        return params, opt_state, kl_w

    t0 = time.time()
    params, opt_state, kl_w = run_epoch(params, opt_state, jnp.float32(0.1), 0)
    compile_s = time.time() - t0

    window_sps = []
    for w in range(2):
        t0 = time.time()
        for e in range(3):
            params, opt_state, kl_w = run_epoch(params, opt_state, kl_w,
                                                3 * w + e + 1)
        window_sps.append(3 * pool.num_batches / (time.time() - t0))
    return {"unroll": unroll, "steps_per_sec": round(max(window_sps), 2),
            "windows": [round(x, 2) for x in window_sps],
            "compile_s": round(compile_s, 1)}


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    sents = build_bench_corpus()
    for u in factors:
        print(json.dumps(time_unroll(u, sents)), flush=True)


if __name__ == "__main__":
    main()
