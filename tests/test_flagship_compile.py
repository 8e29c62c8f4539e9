"""Flagship-shape multi-device compile check (VERDICT r3 task 7).

The DP fused-epoch program — the path real multi-chip users hit first —
must LOWER AND COMPILE at real Yahoo dims (V=20004, ni=512, nh=1024, B=32,
yahoo-like bucket lengths, use_pallas per the yahoo config with its CPU
fallback) under shard_map on the 8-device CPU mesh, aggressive while_loop
included. tests/test_parallel.py validates multi-chip NUMERICS at toy
dims; this catches shard_map SHAPE regressions at the dims that matter
without TPU hardware. Params/optimizer state are ShapeDtypeStructs (never
materialized); only the tiny 4-batch pool is real.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from vae_lagging_encoder_tpu.config import get_config
from vae_lagging_encoder_tpu.data.pool import BucketedPool
from vae_lagging_encoder_tpu.data.text import TextBatch
from vae_lagging_encoder_tpu.models import build_text_vae
from vae_lagging_encoder_tpu.parallel import make_mesh
from vae_lagging_encoder_tpu.train import make_train_epoch

V, B = 20004, 32


def _flagship_pool(lengths=(64, 96), batches_per_bucket=2) -> BucketedPool:
    rng = np.random.RandomState(0)
    tbs = []
    for L in lengths:
        for _ in range(batches_per_bucket):
            toks = np.zeros((B, L), np.int32)
            mask = np.zeros((B, L), np.float32)
            for r in range(B):
                n = rng.randint(L // 2, L + 1)
                toks[r, 0] = 2
                toks[r, 1:n - 1] = rng.randint(4, V, size=n - 2)
                toks[r, n - 1] = 3
                mask[r, :n] = 1.0
            tbs.append(TextBatch(toks, mask, np.ones((B,), np.float32)))
    return BucketedPool(tbs)


def _compile_check(epoch_fn, opt_init, vae, pool):
    """Lower+compile the fused epoch with abstract params at flagship dims
    and assert the executable's param outputs keep their shapes."""
    p_sds = jax.eval_shape(vae.init, jax.random.PRNGKey(0))
    opt_sds = jax.eval_shape(opt_init, p_sds)
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)
    key_sds = jax.eval_shape(jax.random.PRNGKey, 0)
    f32 = jax.ShapeDtypeStruct((), jnp.float32)

    # aggressive=True is the superset program (inner while_loop + both
    # outer-update branches' shapes)
    compiled = epoch_fn.lower(p_sds, opt_sds, key_sds, f32, f32, order,
                              aggressive=True).compile()
    out_shapes = jax.tree.leaves(compiled.out_info)[:len(jax.tree.leaves(p_sds))]
    in_shapes = jax.tree.leaves(p_sds)
    assert [o.shape for o in out_shapes] == [i.shape for i in in_shapes]


def test_flagship_dp_fused_epoch_compiles_on_8way_mesh():
    cfg = get_config("yahoo")  # flagship dims incl. use_pallas default
    assert (cfg.ni, cfg.enc_nh, cfg.dec_nh, cfg.nz) == (512, 1024, 1024, 32)
    vae = build_text_vae(cfg, V)
    mesh = make_mesh(8)
    pool = _flagship_pool().shard(mesh)
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg, mesh=mesh)

    _compile_check(epoch_fn, opt_init, vae, pool)


def test_flagship_dp_tp_fused_epoch_compiles_on_2x4_mesh():
    """Same shape-regression net for the DP x TP path (--dp_devices 2
    --tp_devices 4): the vocab-sharded fused epoch (tp loss, tp-aware
    clip, dec.pred P(None, tp) through the whole carry) must compile at
    real Yahoo dims. V=20004 divides by tp=4; B=32 by dp=2."""
    from vae_lagging_encoder_tpu.parallel import make_tp_mesh

    cfg = get_config("yahoo")
    vae = build_text_vae(cfg, V)
    assert vae.decoder.vocab_size % 4 == 0
    mesh = make_tp_mesh(2, 4)
    pool = _flagship_pool().shard(mesh)
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg, mesh=mesh,
                                          tp_axis="tp")
    _compile_check(epoch_fn, opt_init, vae, pool)
