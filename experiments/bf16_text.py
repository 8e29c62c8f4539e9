"""Text-path bfloat16 end-to-end experiment (VERDICT.md r2 next-round #4).

Measures ``compute_dtype=bfloat16`` (embeddings/matmul inputs bf16, f32
accumulation — the kernels already support it) against the f32 default on
the bench.py Yahoo-like corpus, and bounds the one-step loss drift.

Run on the real TPU from the repo root:
    python experiments/bf16_text.py

Outcome is recorded in RESULTS.md either way (win or negative result) —
no unmeasured defaults.
"""
from __future__ import annotations

import json
import os
import sys
import time

# allow `python experiments/bf16_text.py` from the repo root (the script-dir
# rule would otherwise leave the package off sys.path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BATCH, build_bench_corpus  # the shared bench corpus


def build_pool(cfg):
    from vae_lagging_encoder_tpu.data import BucketedPool, MonoTextData

    data = MonoTextData(sentences=build_bench_corpus())
    return data, BucketedPool(data.create_data_batch(BATCH, cfg.length_buckets))


def measure(compute_dtype: str):
    import jax
    import jax.numpy as jnp

    from vae_lagging_encoder_tpu.config import get_config
    from vae_lagging_encoder_tpu.models import build_text_vae
    from vae_lagging_encoder_tpu.train import make_train_epoch

    cfg = get_config("yahoo", compute_dtype=compute_dtype)
    data, pool = build_pool(cfg)
    vae = build_text_vae(cfg, len(data.vocab))
    params = vae.init(jax.random.PRNGKey(cfg.seed))
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    opt_state = opt_init(params)
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)

    def run(params, opt_state, kl_w, seed):
        params, opt_state, kl_w, sums, _ = epoch_fn(
            params, opt_state, jax.random.PRNGKey(seed), kl_w,
            jnp.float32(1.0), order, aggressive=False)
        jax.block_until_ready(sums)
        return params, opt_state, kl_w, sums

    params, opt_state, kl_w, _ = run(params, opt_state, jnp.float32(0.1), 0)
    t0 = time.time()
    n_epochs = 2
    for e in range(n_epochs):
        params, opt_state, kl_w, sums = run(params, opt_state, kl_w, e + 1)
    dt = time.time() - t0
    sps = n_epochs * pool.num_batches / dt
    # epoch-mean loss for a sanity cross-check between dtypes
    s = [float(x) for x in jax.device_get(sums)]
    return sps, s[0] / max(s[3], 1.0)


def loss_parity():
    """One fwd loss, f32 vs bf16 params-identical, same batch + key."""
    import jax
    import jax.numpy as jnp

    from vae_lagging_encoder_tpu.config import get_config
    from vae_lagging_encoder_tpu.models import build_text_vae

    cfg32 = get_config("yahoo")
    data, pool = build_pool(cfg32)
    vae32 = build_text_vae(cfg32, len(data.vocab))
    vae16 = build_text_vae(cfg32.replace(compute_dtype="bfloat16"),
                           len(data.vocab))
    params = vae32.init(jax.random.PRNGKey(0))
    toks, mask, w = (a[0] for a in pool.arrays[0])
    args = (params, jax.random.PRNGKey(1), toks, mask, w)

    @jax.jit
    def l32(*a):
        return vae32.loss(*a, kl_weight=1.0, train=False)

    @jax.jit
    def l16(*a):
        return vae16.loss(*a, kl_weight=1.0, train=False)

    a32 = [float(jnp.sum(x)) for x in l32(*args)]
    a16 = [float(jnp.sum(x)) for x in l16(*args)]
    rel = abs(a32[0] - a16[0]) / max(abs(a32[0]), 1.0)
    return a32, a16, rel


def main():
    sps32, loss32 = measure("float32")
    print(json.dumps({"dtype": "float32", "steps_per_sec": round(sps32, 2),
                      "epoch_loss_per_sent": round(loss32, 4)}))
    sps16, loss16 = measure("bfloat16")
    print(json.dumps({"dtype": "bfloat16", "steps_per_sec": round(sps16, 2),
                      "epoch_loss_per_sent": round(loss16, 4)}))
    a32, a16, rel = loss_parity()
    print(json.dumps({"loss_f32": a32, "loss_bf16": a16,
                      "rel_drift": rel,
                      "speedup": round(sps16 / sps32, 3)}))


if __name__ == "__main__":
    main()
