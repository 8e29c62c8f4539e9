"""Isolate the lax.switch/conditional cost in the fused epoch (round 5).

The r4/r5 dossiers show ~16% of device step time in copy-done/copy/pad/
conditional — machinery, not math. Hypothesis: the per-step ``lax.switch``
over bucket lengths (data/pool.py) forces XLA to copy the big branch
results (the ~215 MB grads pytree) into the conditional's output buffers
and stage branch operands, even when every executed step takes the same
branch.

Probe: time the SAME 32 batches (all from the 96-token bucket of the
bench corpus) through
  (a) the normal 6-bucket pool  — switch with 6 branches, one taken;
  (b) a pool holding ONLY that bucket — switch degenerates to 1 branch.
Identical math, identical shapes, identical batch content; any device-time
difference is conditional machinery.

Run ON THE REAL CHIP from /root/repo:
    python experiments/switch_probe.py [--steps 32]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def run_case(tag, pool, order_idx, steps, cfg, vae, params_init):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_lagging_encoder_tpu.train import make_train_epoch
    from vae_lagging_encoder_tpu.utils.profiling import distill_trace

    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    params = jax.tree.map(jnp.copy, params_init)
    opt_state = opt_init(params)
    order = jnp.asarray(order_idx, jnp.int32)

    def run(params, opt_state, seed):
        params, opt_state, _, sums, _ = epoch_fn(
            params, opt_state, jax.random.PRNGKey(seed), jnp.float32(1.0),
            jnp.float32(1.0), order, aggressive=False)
        return params, opt_state, float(np.asarray(sums[0]))

    params, opt_state, _ = run(params, opt_state, 0)      # compile
    t0 = time.time()
    params, opt_state, _ = run(params, opt_state, 1)
    wall = time.time() - t0
    troot = tempfile.mkdtemp(prefix=f"switch_probe_{tag}_")
    try:
        with jax.profiler.trace(troot):
            run(params, opt_state, 2)
        summary = distill_trace(troot, steps)
    finally:
        shutil.rmtree(troot, ignore_errors=True)
    cats = {c["category"]: c["ms_per_step"] for c in summary["categories"]}
    return {
        "tag": tag,
        "ms_per_step_device": summary["ms_per_step_device"],
        "wall_s": round(wall, 3),
        "copy_done": cats.get("copy-done", 0.0),
        "data_formatting": cats.get("data formatting", 0.0),
        "pad": cats.get("pad", 0.0),
        "async_done": cats.get("async-done", 0.0),
        "conditional": cats.get("conditional", 0.0),
        "loop_fusion": cats.get("loop fusion", 0.0),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    import bench
    from vae_lagging_encoder_tpu.config import get_config
    from vae_lagging_encoder_tpu.data import BucketedPool, MonoTextData
    from vae_lagging_encoder_tpu.models import build_text_vae

    cfg = get_config("yahoo")
    data = MonoTextData(sentences=bench.build_bench_corpus())
    batches = data.create_data_batch(bench.BATCH, cfg.length_buckets)
    pool6 = BucketedPool(batches)
    # the largest bucket (length 96 on the bench corpus)
    big = int(max(range(pool6.num_buckets), key=lambda k: pool6.counts[k]))
    L = pool6.lengths[big]
    assert pool6.counts[big] >= args.steps, (pool6.counts, args.steps)
    first = int(pool6.cum[big])

    only = [b for b in batches if b.seq_len == L][: args.steps]
    pool1 = BucketedPool(only)
    assert pool1.num_buckets == 1

    vae = build_text_vae(cfg, len(data.vocab))
    params = vae.init(jax.random.PRNGKey(cfg.seed))

    r6 = run_case("6-bucket", pool6,
                  list(range(first, first + args.steps)), args.steps,
                  cfg, vae, params)
    r1 = run_case("1-bucket", pool1, list(range(args.steps)), args.steps,
                  cfg, vae, params)
    print(json.dumps({"bucket_len": L, "six": r6, "one": r1,
                      "delta_ms_per_step": round(
                          r6["ms_per_step_device"]
                          - r1["ms_per_step_device"], 4)}, indent=1))


if __name__ == "__main__":
    main()
