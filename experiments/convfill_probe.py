"""MXU-underfill probe for the image path's conv shapes.

BASELINE.md's image roofline claims the OmniGlot program's 0.20 device
MFU is bounded by SHAPE — 28x28 convs with <=64 channels cannot tile the
128x128 systolic array — rather than by scheduling. This measures that
directly: the achieved TF/s of the PixelCNN workhorse conv (28x28 canvas,
3x3 kernel, B=50) as the channel count sweeps 32..256. If the claim is
right, achieved TF/s should climb steeply with channels (same per-op
overheads, better MXU fill) and keep climbing past the config's 64 —
i.e. the config's shape, not the program around it, sets the ceiling.

Run ON THE REAL CHIP from /root/repo:

    python experiments/convfill_probe.py [--batch 50] [--hw 28] [--reps 30]

Timing traps (verify SKILL.md): the tunnel caches identical-argument
executions, so every rep gets fresh input values; completion is forced
through a host pull of a SCALAR (block_until_ready returns early on
axon, and pulling the full activation tensor would time the tunnel's
~30 MB/s link instead of the conv — the first version of this probe
made exactly that mistake); the REPS convs are chained data-dependently
inside ONE jitted program sized so device time (~0.5-5 s) dwarfs the
~85-300 ms per-dispatch overhead.
"""
from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=50)
    ap.add_argument("--hw", type=int, default=28)
    ap.add_argument("--reps", type=int, default=1200)
    args = ap.parse_args()
    B, HW, REPS = args.batch, args.hw, args.reps

    dn = jax.lax.conv_dimension_numbers(
        (B, HW, HW, 1), (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC"))

    def make_prog(c):
        def prog(x, w):
            # REPS data-dependent convs in one XLA program: per-op launch
            # overhead amortizes, the conv dominates
            def body(x, _):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=jax.lax.conv_dimension_numbers(
                        x.shape, w.shape, ("NHWC", "HWIO", "NHWC")),
                    preferred_element_type=jnp.float32)
                return y / (jnp.max(jnp.abs(y)) + 1.0), None
            x, _ = jax.lax.scan(body, x, None, length=REPS)
            # scalar output: the host pull that forces completion moves
            # 4 bytes, not the 5-40 MB activation tensor
            return jnp.sum(x)
        return jax.jit(prog)

    # per-dispatch overhead baseline: a near-empty program, best of 3
    tiny = jax.jit(lambda v: jnp.sum(v) * 2.0)
    tv = jnp.arange(8, dtype=jnp.float32)
    float(tiny(tv))  # compile
    overhead = float("inf")
    for rep in range(3):
        t0 = time.time()
        float(tiny(tv + rep))
        overhead = min(overhead, time.time() - t0)
    print({"dispatch_overhead_s": round(overhead, 4)})

    rows = []
    for c in (32, 64, 128, 256):
        rng = np.random.RandomState(c)
        x = jnp.asarray(rng.randn(B, HW, HW, c).astype(np.float32) * 0.1)
        w = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.01)
        prog = make_prog(c)
        float(prog(x, w))  # compile
        best = float("inf")
        for rep in range(3):
            x2 = x + 1e-3 * rep  # fresh values: defeat the tunnel cache
            t0 = time.time()
            float(prog(x2, w))  # scalar host pull forces completion
            best = min(best, time.time() - t0)
        # MACs x2 per conv
        flops = 2 * B * HW * HW * 9 * c * c * REPS
        dev_s = max(best - overhead, 1e-9)
        tfs = flops / dev_s / 1e12
        rows.append({"channels": c, "best_s": round(best, 4),
                     "device_s_est": round(dev_s, 4),
                     "achieved_tflops_per_s": round(tfs, 2),
                     "mfu_vs_197": round(tfs / 197, 4)})
        print(rows[-1])
    print(json.dumps({"batch": B, "hw": HW, "reps": REPS,
                      "dispatch_overhead_s": round(overhead, 4),
                      "rows": rows}))


if __name__ == "__main__":
    main()
