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


class Pool:
    """Device-resident batch pool: the generic interface consumed by
    train/epoch.py and train/aggressive.py.

      - ``counts`` / ``cum`` / ``num_batches`` / ``num_buckets``
      - ``sample_coords(key) -> (bucket, idx)`` — uniform in-graph draw
      - ``switch(bucket, idx, fn)`` calling ``fn(*batch_arrays)`` —
        ``(tokens [B,L], mask [B,L], row_weight [B])`` for text;
        ``(probs [B,H,W,C], row_weight [B])`` for images.

    Subclasses fill ``self.arrays`` (one tuple of stacked [n_b, ...] arrays
    per bucket) and call ``_finalize(counts)``.
    """

    arrays: List[Tuple[jnp.ndarray, ...]]

    def _finalize(self, counts) -> None:
        self.counts = np.asarray(counts, np.int32)
        self.cum = np.concatenate([[0], np.cumsum(self.counts)]).astype(np.int32)
        self.num_batches = int(self.cum[-1])

    @property
    def num_buckets(self) -> int:
        return len(self.arrays)

    def sample_coords(self, key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Uniform batch draw → (bucket_id, index_within_bucket), traced."""
        flat = jax.random.randint(key, (), 0, self.num_batches)
        cum = jnp.asarray(self.cum)
        bucket = jnp.searchsorted(cum, flat, side="right") - 1
        return bucket.astype(jnp.int32), (flat - cum[bucket]).astype(jnp.int32)

    def switch(self, bucket: jnp.ndarray, idx: jnp.ndarray, fn: Callable,
               arrays=None):
        """``lax.switch`` over buckets; each branch slices its own stacks and
        calls ``fn(*batch_arrays)``. All branches must return
        identically-shaped pytrees (e.g. grads, scalars).

        ``arrays`` overrides the pool's stacks — used inside ``shard_map``
        where each device must read its LOCAL batch shard, not the global
        closure constant."""
        branches = []
        for k in range(self.num_buckets):
            arrs = self.arrays[k] if arrays is None else arrays[k]

            def branch(i, arrs=arrs):
                return fn(*(a[i] for a in arrs))

            branches.append(branch)
        return jax.lax.switch(bucket, branches, idx)

    # --- flat-leaf view (for passing stacks through shard_map) --------
    def flat_leaves(self) -> List[jnp.ndarray]:
        """All per-bucket stacks as one flat list (shard_map arguments)."""
        return [a for arrs in self.arrays for a in arrs]

    def rebuild(self, leaves: Sequence[jnp.ndarray]) -> List[Tuple[jnp.ndarray, ...]]:
        """Inverse of ``flat_leaves``: regroup into per-bucket tuples, in
        the layout ``switch(..., arrays=...)`` expects."""
        sizes = [len(arrs) for arrs in self.arrays]
        out, k = [], 0
        for n in sizes:
            out.append(tuple(leaves[k:k + n]))
            k += n
        return out

    # --- data parallelism over a mesh ---------------------------------
    def batch_specs(self, axis: str = "dp"):
        """PartitionSpecs sharding every stacked array's BATCH dim (dim 1)
        over ``axis``: [n_b, B, ...] -> P(None, axis, None...)."""
        from jax.sharding import PartitionSpec as P

        return [tuple(P(*([None, axis] + [None] * (a.ndim - 2))) for a in arrs)
                for arrs in self.arrays]

    def shard(self, mesh, axis: str = "dp") -> "Pool":
        """Re-place the stacked arrays batch-sharded over the mesh axis.

        This is a second transfer of data the constructor already placed
        on the default device — accepted: it is a one-time ~tens-of-MB
        move per run, and keeping the constructor eager lets the (far more
        common) single-device path close over committed arrays instead of
        np constants baked into every compiled epoch."""
        from jax.sharding import NamedSharding

        specs = self.batch_specs(axis)
        for k, arrs in enumerate(self.arrays):
            self.arrays[k] = tuple(
                jax.device_put(a, NamedSharding(mesh, s))
                for a, s in zip(arrs, specs[k]))
        return self


class BucketedPool(Pool):
    """Text pool: per bucket-length a stacked (tokens, mask, row_weight)."""

    def __init__(self, batches: Sequence[TextBatch]):
        if not batches:
            raise ValueError("empty batch list")
        groups = {}
        for b in batches:
            groups.setdefault(b.seq_len, []).append(b)
        self.lengths: Tuple[int, ...] = tuple(sorted(groups))
        self.arrays: List[Tuple[jnp.ndarray, ...]] = []
        counts = []
        for L in self.lengths:
            grp = groups[L]
            self.arrays.append((
                jnp.asarray(np.stack([g.tokens for g in grp])),
                jnp.asarray(np.stack([g.mask for g in grp])),
                jnp.asarray(np.stack([g.row_weight for g in grp])),
            ))
            counts.append(len(grp))
        self._finalize(counts)

    # back-compat view used by tests
    @property
    def tokens(self):
        return [a[0] for a in self.arrays]


class ImagePool(Pool):
    """Image pool: one bucket of stacked (probs, row_weight) batches.

    ``images`` are grayscale probabilities [N, H, W, C] in [0, 1]; dynamic
    binarization happens on device inside the loss (parity with
    <ref>image.py's fresh ``torch.bernoulli(batch)`` per step, SURVEY §3.4).
    """

    def __init__(self, images: np.ndarray, batch_size: int):
        from .omniglot import image_batches

        stacked, w = image_batches(images, batch_size)
        self.arrays = [(jnp.asarray(stacked), jnp.asarray(w))]
        self._finalize([stacked.shape[0]])
