"""Probe: what does epoch segmentation cost a PLAIN epoch on the tunnel?

The CLI dispatches epochs in --epoch_segment chunks (default 32) because
the tunneled TPU worker kills long unattended executions — a bound sized
for AGGRESSIVE epochs (~10.7 s device time per 32-outer-step dispatch,
profile dossier). A plain 32-step dispatch is only ~0.2 s of device time,
so the ~30-80 ms/dispatch tunnel overhead (dossier: untraced wall minus
device-busy) is pure tax there. This probe times the same flagship plain
epoch (bench.py corpus + yahoo config) at several segment sizes.

Usage: python experiments/segment_probe.py [seg ...]   (default 32 100)
Prints one JSON line per segment size (bench.py's best-of-two-windows
stall-resistance protocol; real host pull per dispatch, same as the CLI).
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


def main() -> None:
    segs = [int(a) for a in sys.argv[1:]] or [32, 100]
    sents = build_bench_corpus()
    cfg = get_config("yahoo", use_pallas=True)
    data = MonoTextData(sentences=sents)
    pool = BucketedPool(data.create_data_batch(BATCH, cfg.length_buckets))
    vae = build_text_vae(cfg, len(data.vocab))
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)

    for seg in segs:
        params = vae.init(jax.random.PRNGKey(cfg.seed))
        opt_state = opt_init(params)

        def run_epoch(params, opt_state, kl_w, seed, seg=seg):
            kl_w = jnp.float32(kl_w)
            for s, start in enumerate(range(0, pool.num_batches, seg)):
                chunk = order[start:start + seg]
                params, opt_state, kl_w, sums, _ = epoch_fn(
                    params, opt_state,
                    jax.random.fold_in(jax.random.PRNGKey(seed), s), kl_w,
                    jnp.float32(1.0), chunk, aggressive=False)
                # the CLI's per-segment blocking pull (loop.py), which is
                # also the tunnel-safe timing barrier (verify trap #2)
                np.asarray(sums)
            return params, opt_state, kl_w

        t0 = time.time()
        params, opt_state, kl_w = run_epoch(params, opt_state, 0.1, 0)
        compile_s = time.time() - t0

        window_sps = []
        for w in range(2):
            t0 = time.time()
            for e in range(3):
                params, opt_state, kl_w = run_epoch(params, opt_state, kl_w,
                                                    3 * w + e + 1)
            window_sps.append(3 * pool.num_batches / (time.time() - t0))
        print(json.dumps({
            "segment": seg,
            "dispatches_per_epoch": -(-pool.num_batches // seg),
            "steps_per_sec": round(max(window_sps), 2),
            "windows": [round(x, 2) for x in window_sps],
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
