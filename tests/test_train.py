"""Training-layer tests: optim, on-device aggressive inner loop, fused
epoch program, eval suite, end-to-end train_text smoke (CPU)."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_lagging_encoder_tpu.config import get_config
from vae_lagging_encoder_tpu.data import BucketedPool, MonoTextData
from vae_lagging_encoder_tpu.data.synthetic import generate_synthetic_corpus
from vae_lagging_encoder_tpu.models import build_text_vae
from vae_lagging_encoder_tpu.train import (
    clip_by_global_norm, global_norm, make_aggressive_inner, make_au_fn,
    make_eval_fn, make_iwnll_fn, make_loss_fn, make_mi_fn, make_train_epoch,
    sgd_update, load_checkpoint, save_checkpoint)


def tiny_cfg(**kw):
    base = dict(ni=16, enc_nh=24, dec_nh=24, nz=4, batch_size=16, epochs=2,
                length_buckets=(8, 16, 32), burn_max_iters=30, burn_window=5,
                dec_dropout_in=0.0, dec_dropout_out=0.0, warm_up=1,
                iw_nsamples=20, iw_batch=10, decay_epoch=1)
    base.update(kw)
    return get_config("synthetic", **base)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    sents, _ = generate_synthetic_corpus(num_sentences=300, vocab_size=40,
                                         min_len=4, max_len=28, seed=1)
    data = MonoTextData(sentences=sents)
    pool = BucketedPool(data.create_data_batch(cfg.batch_size, cfg.length_buckets))
    vae = build_text_vae(cfg, len(data.vocab))
    params = vae.init(jax.random.PRNGKey(0))
    return cfg, data, pool, vae, params


def test_clip_by_global_norm():
    tree = {"a": jnp.full((3,), 3.0), "b": jnp.full((4,), 4.0)}
    norm = float(global_norm(tree))
    assert abs(norm - math.sqrt(27 + 64)) < 1e-5
    clipped, pre = clip_by_global_norm(tree, 1.0)
    assert abs(float(global_norm(clipped)) - 1.0) < 1e-3
    # below threshold: unchanged
    same, _ = clip_by_global_norm(tree, 100.0)
    np.testing.assert_allclose(np.asarray(same["a"]), 3.0, rtol=1e-5)


def test_sgd_update():
    p = {"w": jnp.ones((2,))}
    g = {"w": jnp.full((2,), 0.5)}
    p2, _ = sgd_update(p, g, 0.1)
    np.testing.assert_allclose(np.asarray(p2["w"]), 0.95, rtol=1e-6)


def test_clip_scale_folded_update_bit_identical():
    """clip_scale + scale-folded update (the fused-epoch path since r5)
    must reproduce clip_by_global_norm-then-update BIT-for-bit, for every
    optimizer and on the non-finite zero-step branch (VERDICT r4 weak #1:
    one read/write pass per leaf instead of two sweeps)."""
    from vae_lagging_encoder_tpu.train import clip_scale
    from vae_lagging_encoder_tpu.train.optim import make_optimizer

    rng = np.random.RandomState(0)
    grads = {"enc": {"a": jnp.asarray(rng.randn(16, 8), jnp.float32)},
             "dec": {"b": jnp.asarray(100 * rng.randn(8, 4), jnp.float32)}}
    params = jax.tree.map(lambda x: x * 0.1, grads)
    bad = jax.tree.map(lambda x: x.at[0, 0].set(jnp.inf), grads)

    def same(a, b):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    for name, mom in (("sgd", 0.0), ("sgd", 0.9), ("adam", 0.0)):
        init_fn, upd = make_optimizer(name, momentum=mom)
        st = jax.tree.map(lambda x: x * 0.01, init_fn(params))
        for g in (grads, bad):
            gc, _ = clip_by_global_norm(g, 5.0)
            pa, sa = upd(params, gc, st, 0.5)
            s, _, fin = clip_scale(g, 5.0)
            pb, sb = upd(params, g, st, 0.5, scale=s, finite=fin)
            same(pa, pb)
            same(sa, sb)
    # non-finite grads leave params exactly unchanged (the zero-step guard)
    s, _, fin = clip_scale(bad, 5.0)
    pb, _ = sgd_update(params, bad, 1.0, scale=s, finite=fin)
    same(pb, params)


def test_aggressive_inner_updates_encoder_only(setup):
    cfg, data, pool, vae, params = setup
    loss_fn = make_loss_fn(vae, train=True)
    inner = make_aggressive_inner(loss_fn, pool, cfg.clip_grad,
                                  cfg.burn_max_iters, cfg.burn_window)
    inner_jit = jax.jit(inner)
    new_params, _, n_sub = inner_jit(params, {"enc": {}, "dec": {}},
                                     jax.random.PRNGKey(1),
                                     jnp.float32(1.0), jnp.float32(0.5))
    n_sub = int(n_sub)
    assert 1 <= n_sub <= cfg.burn_max_iters
    # decoder untouched, encoder changed
    for a, b in zip(jax.tree.leaves(params["dec"]),
                    jax.tree.leaves(new_params["dec"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    enc_diff = sum(float(jnp.abs(a - b).sum()) for a, b in
                   zip(jax.tree.leaves(params["enc"]),
                       jax.tree.leaves(new_params["enc"])))
    assert enc_diff > 0


def test_epoch_fn_trains_and_anneals(setup):
    cfg, data, pool, vae, params = setup
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)
    p0 = jax.tree.map(jnp.copy, params)
    p1, os1, klw1, sums1, ii1 = epoch_fn(p0, opt_init(p0),
                                         jax.random.PRNGKey(2), jnp.float32(0.1),
                                         jnp.float32(1.0), order, aggressive=False)
    assert int(ii1) == 0
    loss1 = float(sums1[0]) / float(sums1[3])
    # anneal rate = 0.9 / (warm_up * nb); after nb steps with warm_up=1 -> 1.0
    assert abs(float(klw1) - 1.0) < 1e-5
    p2, os2, klw2, sums2, _ = epoch_fn(p1, os1, jax.random.PRNGKey(3), klw1,
                                       jnp.float32(1.0), order, aggressive=False)
    loss2 = float(sums2[0]) / float(sums2[3])
    assert loss2 < loss1  # training reduces loss epoch-over-epoch
    assert np.isfinite(loss2)


def test_pick_segment_auto_and_explicit():
    """--epoch_segment None = auto per mode (watchdog-bounded, amortizes
    the measured ~85-140 ms/dispatch tunnel overhead); explicit N keeps
    the legacy log_niter cap; 0 = whole epoch."""
    from vae_lagging_encoder_tpu.train.loop import (AGGRESSIVE_SEGMENT,
                                                    PLAIN_SEGMENT,
                                                    pick_segment)
    cfg = get_config("yahoo")  # epoch_segment None, log_niter 50
    assert cfg.epoch_segment is None
    assert pick_segment(cfg, True, 10_000) == AGGRESSIVE_SEGMENT
    assert pick_segment(cfg, False, 10_000) == PLAIN_SEGMENT
    assert pick_segment(cfg, False, 7) == 7        # never exceeds the epoch
    assert pick_segment(cfg.replace(epoch_segment=40), False, 10_000) == 40
    # explicit N is capped by log_niter (exact log cadence)
    assert pick_segment(cfg.replace(epoch_segment=200), False, 10_000) == 50
    # 0 = the whole epoch in one dispatch, no cap
    assert pick_segment(cfg.replace(epoch_segment=0), False, 10_000) == 10_000
    # auto honors the user's --autosave_niter crash-loss window (autosaves
    # can only fire at segment boundaries; code-review r4)
    assert pick_segment(cfg.replace(autosave_niter=50), False, 10_000) == 50
    assert pick_segment(cfg.replace(autosave_niter=50), True, 10_000) == 32
    assert pick_segment(cfg.replace(autosave_niter=500), False, 10_000) \
        == PLAIN_SEGMENT
    # ... and so do the explicit paths (ADVICE r4: an explicit segment or
    # 0 wider than autosave_niter would silently take no mid-epoch saves)
    assert pick_segment(cfg.replace(epoch_segment=40, autosave_niter=10),
                        False, 10_000) == 10
    assert pick_segment(cfg.replace(epoch_segment=0, autosave_niter=64),
                        False, 10_000) == 64


def test_epoch_fn_loop_unroll_bit_exact(setup):
    """loop_unroll is a pure scheduling knob: the fused plain epoch must be
    BIT-identical at any factor, including one that does not divide the
    step count (lax.scan pads the last partial group with a predicated
    remainder)."""
    cfg, data, pool, vae, params = setup
    # 7 steps with unroll 3 exercises the non-divisible remainder path
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)[:7]
    assert order.shape[0] == 7
    results = []
    for unroll in (1, 3):
        epoch_fn, opt_init = make_train_epoch(vae, pool,
                                              cfg.replace(loop_unroll=unroll))
        p0 = jax.tree.map(jnp.copy, params)
        results.append(epoch_fn(p0, opt_init(p0), jax.random.PRNGKey(2),
                                jnp.float32(0.1), jnp.float32(1.0), order,
                                aggressive=False))
    (p1, _, klw1, sums1, _), (p3, _, klw3, sums3, _) = results
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(sums1), np.asarray(sums3))
    assert float(klw1) == float(klw3)


@pytest.mark.slow  # 33s; aggressive semantics stay covered fast by
# test_aggressive_inner_updates_encoder_only + the golden epoch
def test_epoch_fn_aggressive_runs_inner(setup):
    cfg, data, pool, vae, params = setup
    cfg = cfg.replace(burn_max_iters=6, burn_window=3)
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)
    p0 = jax.tree.map(jnp.copy, params)
    _, _, _, _, inner_iters = epoch_fn(p0, opt_init(p0),
                                       jax.random.PRNGKey(4), jnp.float32(0.1),
                                       jnp.float32(0.5), order, aggressive=True)
    assert int(inner_iters) >= pool.num_batches  # ≥1 sub-iter per step


def test_adam_optimizer_step():
    from vae_lagging_encoder_tpu.train.optim import make_optimizer

    init_fn, update_fn = make_optimizer("adam")
    p = {"w": jnp.ones((3,))}
    s = init_fn(p)
    g = {"w": jnp.full((3,), 0.1)}
    p1, s1 = update_fn(p, g, s, 1e-1)
    # first Adam step moves by ~lr in the gradient direction
    np.testing.assert_allclose(np.asarray(p1["w"]), 1.0 - 0.1, atol=1e-5)
    assert int(s1["t"]) == 1
    p2, s2 = update_fn(p1, g, s1, 1e-1)
    assert float(p2["w"][0]) < float(p1["w"][0])


@pytest.mark.slow  # 45s; estimator math is unit-tested in test_models
def test_eval_suite(setup):
    cfg, data, pool, vae, params = setup
    key = jax.random.PRNGKey(5)
    ev = make_eval_fn(vae, pool)(params, key)
    assert ev["n_sents"] == 300
    assert ev["ppl"] > 1
    assert abs(ev["nll"] - (ev["rec"] + ev["kl"])) < 1e-3
    mi = make_mi_fn(vae, pool)(params, key)
    assert np.isfinite(mi)
    au, var = make_au_fn(vae, pool)(params, key)
    assert 0 <= au <= vae.nz and var.shape == (vae.nz,)
    iw = make_iwnll_fn(vae, pool, nsamples=20, ns=10)(params, key)
    # IW bound is tighter than ELBO: iw_nll <= elbo nll (+MC slack)
    assert iw["nll"] <= ev["nll"] + 0.5
    assert iw["ppl"] <= ev["ppl"] * 1.1
    # segmented reduction (tunnel-kill-horizon protection at large eval
    # sets) must reproduce the single-program result: per-batch keys are
    # position-derived either way, only the summation grouping changes
    iw_seg = make_iwnll_fn(vae, pool, nsamples=20, ns=10,
                           segment=3)(params, key)
    assert abs(iw_seg["nll"] - iw["nll"]) < 1e-4
    assert iw_seg["n_sents"] == iw["n_sents"]


def test_iw_batch_divisibility_guard(setup):
    """--iw_nsamples % --iw_batch is validated BEFORE any device work in
    BOTH lifecycle entry points: run_training (so a misconfigured run dies
    at startup, not hours later at the final IW eval) AND run_final_eval
    (the --eval path would otherwise complete the whole ELBO/MI/AU suite
    before the IW reducer's bare assert discarded everything)."""
    from vae_lagging_encoder_tpu.train.loop import (run_final_eval,
                                                    run_training)
    from vae_lagging_encoder_tpu.utils.exp_utils import Logger

    cfg, data, pool, vae, params = setup
    bad = tiny_cfg(iw_nsamples=20, iw_batch=7)
    with pytest.raises(SystemExit, match="divisible"):
        run_training(bad, vae, params, pool, pool, pool, Logger())
    with pytest.raises(SystemExit, match="divisible"):
        run_final_eval(bad, vae, params, pool, Logger())
    # iw_nsamples <= iw_batch must PASS the guard: the estimators clamp
    # the chunk to min(iw_batch, iw_nsamples) and run one chunk, so e.g.
    # `--eval --iw_nsamples 10` under a config default iw_batch=100 is a
    # valid (and common) quick-eval invocation (r5 review)
    ok = tiny_cfg(iw_nsamples=5, iw_batch=100)
    r = run_final_eval(ok, vae, params, pool, Logger())
    assert np.isfinite(r["iw_nll"])


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, data, pool, vae, params = setup
    path = str(tmp_path / "ck.pkl")
    save_checkpoint(path, params, {"epoch": 3, "kl_weight": 0.7})
    p2, extra = load_checkpoint(path)
    assert extra["epoch"] == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_is_not_pickle_and_rejects_code(tmp_path, setup):
    """New format is a plain npz (no executable content); legacy pickles
    load through a numpy-only unpickler that rejects arbitrary globals."""
    import os
    import pickle

    cfg, data, pool, vae, params = setup
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, params, {
        "opt_state": {"enc": {}, "dec": {"m": np.ones(3), "t": np.int32(7)}},
        "tup": (1, 2.5), "none": None})
    with open(path, "rb") as fh:
        assert fh.read(2) == b"PK"  # zip/npz magic, not a pickle
    _, extra = load_checkpoint(path)
    assert extra["tup"] == (1, 2.5) and extra["none"] is None
    np.testing.assert_array_equal(extra["opt_state"]["dec"]["m"], np.ones(3))
    assert int(extra["opt_state"]["dec"]["t"]) == 7

    # legacy round-1 pickles still load (numpy payloads only)
    legacy = str(tmp_path / "legacy.ckpt")
    with open(legacy, "wb") as fh:
        pickle.dump({"params": {"w": np.arange(4.0)}, "extra": {"epoch": 1}},
                    fh, protocol=4)
    p, e = load_checkpoint(legacy)
    np.testing.assert_array_equal(p["w"], np.arange(4.0))
    assert e["epoch"] == 1

    class Evil:
        def __reduce__(self):
            return (os.system, ("true",))

    evil = str(tmp_path / "evil.ckpt")
    with open(evil, "wb") as fh:
        pickle.dump({"params": Evil()}, fh)
    with pytest.raises(pickle.UnpicklingError):
        load_checkpoint(evil)


@pytest.mark.slow
def test_resume_continues_training(tmp_path):
    """--resume restores kl_weight/lr/epoch/flags and continues."""
    from vae_lagging_encoder_tpu.train import train_text

    root = tmp_path / "data"
    root.mkdir()
    sents, topics = generate_synthetic_corpus(num_sentences=120, vocab_size=25,
                                              min_len=4, max_len=14, seed=11)
    for split, sl in {"train": slice(0, 80), "valid": slice(80, 100),
                      "test": slice(100, 120)}.items():
        with open(root / f"{split}.txt", "w") as fh:
            for t, s in zip(topics[sl], sents[sl]):
                fh.write(f"{t}\t" + " ".join(s) + "\n")
    cfg = tiny_cfg(train_data=str(root / "train.txt"),
                   val_data=str(root / "valid.txt"),
                   test_data=str(root / "test.txt"), epochs=2,
                   save_path=str(tmp_path / "m.ckpt"))
    train_text(cfg)
    from vae_lagging_encoder_tpu.train import load_checkpoint
    _, extra1 = load_checkpoint(cfg.save_path)
    # resume for 2 more epochs
    cfg2 = cfg.replace(epochs=4, load_path=cfg.save_path, resume=True)
    r2 = train_text(cfg2)
    _, extra2 = load_checkpoint(cfg.save_path)
    assert extra2["epoch"] > extra1["epoch"]
    assert np.isfinite(r2["iw_nll"])


@pytest.mark.slow
def test_midepoch_autosave_resume_is_exact(tmp_path):
    """A run killed mid-epoch and resumed from the periodic autosave must
    reproduce the uninterrupted run EXACTLY (params, results) — the
    fault-tolerance path (SURVEY.md §5 'restart-from-step')."""
    from vae_lagging_encoder_tpu.train.loop import (load_text_datasets,
                                                    run_training)
    from vae_lagging_encoder_tpu.utils.exp_utils import Logger

    root = tmp_path / "data"
    root.mkdir()
    sents, topics = generate_synthetic_corpus(num_sentences=152, vocab_size=25,
                                              min_len=4, max_len=14, seed=13)
    for split, sl in {"train": slice(0, 112), "valid": slice(112, 132),
                      "test": slice(132, 152)}.items():
        with open(root / f"{split}.txt", "w") as fh:
            for t, s in zip(topics[sl], sents[sl]):
                fh.write(f"{t}\t" + " ".join(s) + "\n")

    def make(run_dir):
        cfg = tiny_cfg(train_data=str(root / "train.txt"),
                       val_data=str(root / "valid.txt"),
                       test_data=str(root / "test.txt"), epochs=3,
                       aggressive=True, burn_max_iters=4, burn_window=2,
                       epoch_segment=2, autosave_niter=2,
                       save_path=str(run_dir / "m.ckpt"))
        train, val, test = load_text_datasets(cfg)
        mk = lambda d: BucketedPool(d.create_data_batch(cfg.batch_size,
                                                        cfg.length_buckets))
        vae = build_text_vae(cfg, len(train.vocab))
        params = vae.init(jax.random.PRNGKey(cfg.seed))
        return cfg, vae, params, mk(train), mk(val), mk(test)

    # oracle: uninterrupted run
    d1 = tmp_path / "full"; d1.mkdir()
    cfg, vae, params, tr, va, te = make(d1)
    full = run_training(cfg, vae, params, tr, va, te, Logger())

    # interrupted at a mid-epoch segment (8 batches/epoch, segments of 2 —
    # autosave_niter=2 so the crash-loss cap keeps the explicit segment at 2:
    # 4 segments per epoch -> stopping after 5 is inside epoch 1), then resumed
    d2 = tmp_path / "resumed"; d2.mkdir()
    cfg2, vae2, params2, tr2, va2, te2 = make(d2)
    r = run_training(cfg2, vae2, params2, tr2, va2, te2, Logger(),
                     _stop_after_segments=5)
    assert r.get("interrupted") and os.path.exists(r["autosave_path"])
    auto_params, extra = load_checkpoint(r["autosave_path"])
    assert extra["mid_epoch"]["epoch"] == 1  # really mid-epoch
    resumed = run_training(cfg2, vae2, jax.tree.map(jnp.asarray, auto_params),
                           tr2, va2, te2, Logger(), resume_state=extra)

    assert resumed["best_val_loss"] == pytest.approx(full["best_val_loss"],
                                                     abs=1e-6)
    for k in ("elbo_loss", "iw_nll", "mi"):
        assert resumed[k] == pytest.approx(full[k], abs=1e-5), k
    p_full, _ = load_checkpoint(cfg.save_path)
    p_res, _ = load_checkpoint(cfg2.save_path)
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_res)):
        np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.slow
def test_train_text_end_to_end(tmp_path):
    """Full lifecycle smoke: plain + aggressive, 2 epochs, tiny data."""
    from vae_lagging_encoder_tpu.train import train_text

    root = tmp_path / "data"
    root.mkdir()
    sents, topics = generate_synthetic_corpus(num_sentences=260, vocab_size=30,
                                              min_len=4, max_len=20, seed=2)
    for split, sl in {"train": slice(0, 200), "valid": slice(200, 230),
                      "test": slice(230, 260)}.items():
        with open(root / f"{split}.txt", "w") as fh:
            for t, s in zip(topics[sl], sents[sl]):
                fh.write(f"{t}\t" + " ".join(s) + "\n")

    cfg = tiny_cfg(
        train_data=str(root / "train.txt"), val_data=str(root / "valid.txt"),
        test_data=str(root / "test.txt"), epochs=2, aggressive=True,
        burn_max_iters=4, burn_window=2,
        save_path=str(tmp_path / "model.ckpt"))
    results = train_text(cfg)
    for k in ("elbo_loss", "rec", "kl", "mi", "au", "iw_nll", "iw_ppl"):
        assert k in results and np.isfinite(results[k]), k
    assert os.path.exists(cfg.save_path)
    # eval-only path reuses the checkpoint
    cfg_eval = cfg.replace(eval=True, load_path=cfg.save_path)
    r2 = train_text(cfg_eval)
    assert np.isfinite(r2["iw_nll"])
