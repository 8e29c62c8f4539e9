"""DP sharding tests on the emulated 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_lagging_encoder_tpu.config import get_config
from vae_lagging_encoder_tpu.data import MonoTextData
from vae_lagging_encoder_tpu.data.synthetic import generate_synthetic_corpus
from vae_lagging_encoder_tpu.models import build_text_vae
from vae_lagging_encoder_tpu.parallel import (make_dp_train_step, make_mesh,
                                              shard_batch)
from vae_lagging_encoder_tpu.train import make_loss_fn
from vae_lagging_encoder_tpu.train.optim import clip_by_global_norm, sgd_update


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow  # 70s of CPU jit; the fused-epoch DP test below
# and dryrun_multichip keep fast DP coverage
def test_dp_step_matches_single_device():
    """psum'd DP gradients must reproduce the single-device update."""
    cfg = get_config("synthetic", ni=8, enc_nh=12, nz=2, dec_nh=12,
                     dec_dropout_in=0.0, dec_dropout_out=0.0, batch_size=16)
    sents, _ = generate_synthetic_corpus(num_sentences=64, vocab_size=20,
                                         min_len=4, max_len=10, seed=0)
    data = MonoTextData(sentences=sents)
    (batch,) = [b for b in data.create_data_batch(64, buckets=(16,))][:1]
    vae = build_text_vae(cfg, len(data.vocab))
    params = vae.init(jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    dp_step = make_dp_train_step(vae, cfg, mesh)
    toks, mask, rw = shard_batch(mesh, batch.tokens, batch.mask, batch.row_weight)
    key = jax.random.PRNGKey(1)
    p_dp, aux_dp = dp_step(jax.tree.map(jnp.copy, params), key, toks, mask, rw,
                           jnp.float32(1.0), jnp.float32(0.5))

    # single-device oracle with matching per-shard keys
    loss_fn = make_loss_fn(vae, train=True)
    n_global = batch.row_weight.sum()

    def objective(p):
        total = 0.0
        sums = None
        for s in range(8):
            sl = slice(s * 8, (s + 1) * 8)
            k_s = jax.random.fold_in(key, s)
            _, aux = loss_fn(p, k_s, (jnp.asarray(batch.tokens[sl]),
                                      jnp.asarray(batch.mask[sl]),
                                      jnp.asarray(batch.row_weight[sl])), 1.0)
            total = total + aux[0] / n_global
            sums = aux if sums is None else jax.tree.map(jnp.add, sums, aux)
        return total, sums

    (_, aux_ref), grads = jax.value_and_grad(objective, has_aux=True)(params)
    grads, _ = clip_by_global_norm(grads, cfg.clip_grad)
    p_ref, _ = sgd_update(params, grads, 0.5)

    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux_dp[0]), np.asarray(aux_ref[0]),
                               rtol=1e-5)


def _emulated_dp_loss(loss_fn, n_shards: int):
    """Single-device oracle of the DP objective: the shard_map program
    computes, per shard s, grads of loss_sum_s(key folded with s) / psum(n)
    and psums them — identical to the gradient of
    sum_s loss_sum_s(fold_in(key, s)) / n_global, with psum'd aux = summed
    aux. Returning that sum as a loss_fn lets make_train_epoch(mesh=None)
    replay the 8-shard epoch (inner while_loop included) exactly."""
    def wrapped(params, key, batch, kl_weight):
        tokens, mask, rw = batch
        S = tokens.shape[0] // n_shards
        n_global = jnp.maximum(rw.sum(), 1.0)
        total, sums = 0.0, None
        for s in range(n_shards):
            sl = slice(s * S, (s + 1) * S)
            k_s = jax.random.fold_in(key, s)
            _, aux = loss_fn(params, k_s, (tokens[sl], mask[sl], rw[sl]),
                             kl_weight)
            total = total + aux[0] / n_global
            sums = aux if sums is None else jax.tree.map(jnp.add, sums, aux)
        return total, sums
    return wrapped


@pytest.mark.slow
def test_dp_fused_epoch_matches_single_device():
    """The whole fused epoch under shard_map (psum'd inner+outer grads,
    aggressive while_loop included) must reproduce the single-device
    emulated-DP oracle EXACTLY (same per-shard keys, dropout off): final
    params, stat sums, and inner-iteration counts allclose at 1e-5."""
    import jax.numpy as jnp
    from vae_lagging_encoder_tpu.data import BucketedPool
    from vae_lagging_encoder_tpu.train import make_loss_fn, make_train_epoch

    cfg = get_config("synthetic", ni=8, enc_nh=16, nz=2, dec_nh=16,
                     dec_dropout_in=0.0, dec_dropout_out=0.0, batch_size=16,
                     warm_up=1, burn_max_iters=4, burn_window=2)
    sents, _ = generate_synthetic_corpus(num_sentences=96, vocab_size=20,
                                         min_len=4, max_len=12, seed=5)
    data = MonoTextData(sentences=sents)
    vae = build_text_vae(cfg, len(data.vocab))
    params = vae.init(jax.random.PRNGKey(0))

    def run(mesh, loss_fn=None):
        pool = BucketedPool(data.create_data_batch(16, buckets=(8, 16)))
        if mesh is not None:
            pool.shard(mesh)
        epoch_fn, opt_init = make_train_epoch(vae, pool, cfg,
                                              loss_fn=loss_fn, mesh=mesh)
        p = jax.tree.map(jnp.copy, params)
        order = jnp.arange(pool.num_batches, dtype=jnp.int32)
        return epoch_fn(p, opt_init(p), jax.random.PRNGKey(7),
                        jnp.float32(0.5), jnp.float32(0.3), order,
                        aggressive=True)

    oracle = _emulated_dp_loss(make_loss_fn(vae, train=True), 8)
    p1, _, klw1, sums1, ii1 = run(None, loss_fn=oracle)
    p8, _, klw8, sums8, ii8 = run(make_mesh(8))
    assert float(klw1) == float(klw8)
    assert int(ii1) == int(ii8) and int(ii8) > 0
    for a, b in zip(sums1, sums8):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow  # 45s; eval math itself is covered by test_train
def test_sharded_eval_matches_unsharded():
    """The batch-parallel eval suite (ELBO / MI / AU / IW-NLL) must return
    the unsharded values to fp tolerance — same per-batch fold_in keys, so
    every per-batch term is identical; only the closing psum reorders the
    sum (SURVEY.md §7 step 7)."""
    from vae_lagging_encoder_tpu.data import BucketedPool
    from vae_lagging_encoder_tpu.train.epoch import (make_au_fn, make_eval_fn,
                                                     make_iwnll_fn, make_mi_fn)

    cfg = get_config("synthetic", ni=8, enc_nh=12, nz=3, dec_nh=12,
                     dec_dropout_in=0.0, dec_dropout_out=0.0, batch_size=8)
    sents, _ = generate_synthetic_corpus(num_sentences=88, vocab_size=20,
                                         min_len=4, max_len=12, seed=9)
    data = MonoTextData(sentences=sents)
    # 11 batches: not divisible by 8 -> exercises the tail-padding path
    pool = BucketedPool(data.create_data_batch(8, buckets=(8, 16)))
    assert pool.num_batches % 8 != 0
    vae = build_text_vae(cfg, len(data.vocab))
    params = vae.init(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(5)
    mesh = make_mesh(8)

    e1 = make_eval_fn(vae, pool)(params, key)
    e8 = make_eval_fn(vae, pool, mesh=mesh)(params, key)
    for k in ("loss", "rec", "kl", "nll", "ppl", "n_sents", "n_words"):
        np.testing.assert_allclose(e1[k], e8[k], rtol=1e-5)

    mi1 = make_mi_fn(vae, pool)(params, key)
    mi8 = make_mi_fn(vae, pool, mesh=mesh)(params, key)
    np.testing.assert_allclose(mi1, mi8, rtol=1e-4, atol=1e-6)

    au1, var1 = make_au_fn(vae, pool)(params, key)
    au8, var8 = make_au_fn(vae, pool, mesh=mesh)(params, key)
    assert au1 == au8
    np.testing.assert_allclose(var1, var8, rtol=1e-5)

    iw1 = make_iwnll_fn(vae, pool, nsamples=10, ns=5)(params, key)
    iw8 = make_iwnll_fn(vae, pool, nsamples=10, ns=5, mesh=mesh)(params, key)
    np.testing.assert_allclose(iw1["nll"], iw8["nll"], rtol=1e-5)
    np.testing.assert_allclose(iw1["ppl"], iw8["ppl"], rtol=1e-4)


def test_dp_step_runs_multiple_steps():
    cfg = get_config("synthetic", ni=8, enc_nh=12, nz=2, dec_nh=12,
                     dec_dropout_in=0.0, dec_dropout_out=0.0)
    sents, _ = generate_synthetic_corpus(num_sentences=64, vocab_size=20,
                                         min_len=4, max_len=10, seed=3)
    data = MonoTextData(sentences=sents)
    (batch,) = data.create_data_batch(64, buckets=(16,))[:1]
    vae = build_text_vae(cfg, len(data.vocab))
    params = vae.init(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    step = make_dp_train_step(vae, cfg, mesh)
    toks, mask, rw = shard_batch(mesh, batch.tokens, batch.mask, batch.row_weight)
    losses = []
    for i in range(3):
        params, aux = step(params, jax.random.PRNGKey(i), toks, mask, rw,
                           jnp.float32(1.0), jnp.float32(1.0))
        losses.append(float(aux[0]) / float(aux[3]))
    assert losses[-1] < losses[0]


def _emulated_dp_image_loss(loss_fn, n_shards: int):
    """Image-batch ((probs, row_weight)) variant of _emulated_dp_loss."""
    def wrapped(params, key, batch, kl_weight):
        probs, rw = batch
        S = probs.shape[0] // n_shards
        n_global = jnp.maximum(rw.sum(), 1.0)
        total, sums = 0.0, None
        for s in range(n_shards):
            sl = slice(s * S, (s + 1) * S)
            k_s = jax.random.fold_in(key, s)
            _, aux = loss_fn(params, k_s, (probs[sl], rw[sl]), kl_weight)
            total = total + aux[0] / n_global
            sums = aux if sums is None else jax.tree.map(jnp.add, sums, aux)
        return total, sums
    return wrapped


@pytest.mark.slow
def test_dp_fused_epoch_matches_single_device_image():
    """The IMAGE stack (ResNet + PixelCNN, in-graph dynamic binarization)
    under the same shard_map fused epoch: exact single-device equivalence
    with matching per-shard keys — the binarization draw is keyed per
    shard, so the oracle must replay the same folds."""
    import jax.numpy as jnp
    from vae_lagging_encoder_tpu.config import get_config as gc
    from vae_lagging_encoder_tpu.data.pool import ImagePool
    from vae_lagging_encoder_tpu.models import build_image_vae
    from vae_lagging_encoder_tpu.train import make_train_epoch
    from vae_lagging_encoder_tpu.train.epoch import make_image_loss_fn

    cfg = gc("omniglot", nz=2, enc_layers=(4, 6), dec_layers=2,
             dec_filters=8, dec_kernel_size=3, batch_size=16, warm_up=1,
             burn_max_iters=2, burn_window=1, optim="sgd", lr=0.1)
    rng = np.random.RandomState(3)
    imgs = rng.rand(64, 28, 28, 1).astype(np.float32)
    vae = build_image_vae(cfg)
    params = vae.init(jax.random.PRNGKey(0))
    loss_fn = make_image_loss_fn(vae, train=True)

    def run(mesh, lf):
        pool = ImagePool(imgs, cfg.batch_size)
        if mesh is not None:
            pool.shard(mesh)
        epoch_fn, opt_init = make_train_epoch(vae, pool, cfg, loss_fn=lf,
                                              mesh=mesh)
        p = jax.tree.map(jnp.copy, params)
        order = jnp.arange(pool.num_batches, dtype=jnp.int32)
        return epoch_fn(p, opt_init(p), jax.random.PRNGKey(7),
                        jnp.float32(0.5), jnp.float32(cfg.lr), order,
                        aggressive=True)

    p1, _, klw1, sums1, ii1 = run(None, _emulated_dp_image_loss(loss_fn, 8))
    p8, _, klw8, sums8, ii8 = run(make_mesh(8), loss_fn)
    assert float(klw1) == float(klw8)
    assert int(ii1) == int(ii8) and int(ii8) > 0
    for a, b in zip(sums1, sums8):
        # atol floor: the near-zero KL sum picks up f32 reduction-order
        # noise from psum vs the oracle's sequential adds
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mesh_pool_reducer_honors_segment():
    """make_pool_reducer(mesh=..., segment=...) must return the SAME sums
    as the unsegmented mesh path and the single-device path — before the
    round-4 fix the mesh branch silently ignored `segment`, so a tp-only
    (dp=1) final IW eval ran the whole pool in one dispatch (the exact
    ~86 s program the tunnel watchdog kills)."""
    import jax.numpy as jnp

    from vae_lagging_encoder_tpu.data import BucketedPool
    from vae_lagging_encoder_tpu.train.epoch import make_pool_reducer

    sents, _ = generate_synthetic_corpus(num_sentences=112, vocab_size=20,
                                         min_len=4, max_len=12, seed=9)
    data = MonoTextData(sentences=sents)
    pool = BucketedPool(data.create_data_batch(16, buckets=(8, 16)))

    def batch_fn(params, key, batch):
        tokens, mask, rw = batch
        noise = jax.random.uniform(key, ())  # key-sensitive: fold_in parity
        return (jnp.sum(tokens * mask) * params + noise, rw.sum())

    init = (jnp.float32(0.0), jnp.float32(0.0))
    p = jnp.float32(2.0)
    mesh = make_mesh(8)
    base = make_pool_reducer(pool, batch_fn, init)(p, jax.random.PRNGKey(3))
    whole = make_pool_reducer(pool, batch_fn, init, mesh=mesh)(
        p, jax.random.PRNGKey(3))
    seg = make_pool_reducer(pool, batch_fn, init, mesh=mesh, segment=2)(
        p, jax.random.PRNGKey(3))
    for a, b, c in zip(base, whole, seg):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
        np.testing.assert_allclose(float(a), float(c), rtol=1e-6)
