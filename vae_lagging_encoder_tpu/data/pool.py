"""Device-resident bucketed batch pool.

TPU-first replacement for the reference's host-side random-batch sampling in
the aggressive inner loop (<ref>text.py §aggressive inner loop, SURVEY.md
§3.2: ``sub_batch = train_batches[randint(num_batches)]`` every sub-iter).
Each host round-trip there costs a full dispatch; instead we stage the whole
(padded, bucketed) training set in HBM once and sample batches **in-graph**:

- one stacked array per bucket length L_b: tokens [n_b, B, L_b] (int32),
  mask [n_b, B, L_b], row_weight [n_b, B];
- a uniform draw over all n = Σ n_b batches maps to (bucket, index) by
  cumulative counts; a ``lax.switch`` over the (few) buckets dispatches to a
  loss whose scan length matches that bucket — so a sampled short batch
  costs a short scan, preserving the reference's cost profile (which never
  padded) while keeping every shape static.

Yahoo scale check: ~100k sentences × ~100 tokens × 4 B ≈ 40 MB of HBM for
tokens — negligible next to model/optimizer state.
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .text import TextBatch


class BucketedPool:
    def __init__(self, batches: Sequence[TextBatch]):
        if not batches:
            raise ValueError("empty batch list")
        groups = {}
        for b in batches:
            groups.setdefault(b.seq_len, []).append(b)
        self.lengths: Tuple[int, ...] = tuple(sorted(groups))
        self.tokens: List[jnp.ndarray] = []
        self.mask: List[jnp.ndarray] = []
        self.row_weight: List[jnp.ndarray] = []
        counts = []
        for L in self.lengths:
            grp = groups[L]
            self.tokens.append(jnp.asarray(np.stack([g.tokens for g in grp])))
            self.mask.append(jnp.asarray(np.stack([g.mask for g in grp])))
            self.row_weight.append(jnp.asarray(np.stack([g.row_weight for g in grp])))
            counts.append(len(grp))
        self.counts = np.asarray(counts, np.int32)
        self.cum = np.concatenate([[0], np.cumsum(self.counts)]).astype(np.int32)
        self.num_batches = int(self.cum[-1])

    @property
    def num_buckets(self) -> int:
        return len(self.lengths)

    def sample_coords(self, key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Uniform batch draw → (bucket_id, index_within_bucket), traced."""
        flat = jax.random.randint(key, (), 0, self.num_batches)
        cum = jnp.asarray(self.cum)
        bucket = jnp.searchsorted(cum, flat, side="right") - 1
        return bucket.astype(jnp.int32), (flat - cum[bucket]).astype(jnp.int32)

    def switch(self, bucket: jnp.ndarray, idx: jnp.ndarray,
               fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], any]):
        """``lax.switch`` over buckets; each branch slices its own stack and
        calls ``fn(tokens[B,L_b], mask[B,L_b], row_weight[B])``. All branches
        must return identically-shaped pytrees (e.g. grads, scalars)."""
        branches = []
        for k in range(self.num_buckets):
            tok, msk, rw = self.tokens[k], self.mask[k], self.row_weight[k]

            def branch(i, tok=tok, msk=msk, rw=rw):
                return fn(tok[i], msk[i], rw[i])

            branches.append(branch)
        return jax.lax.switch(bucket, branches, idx)
