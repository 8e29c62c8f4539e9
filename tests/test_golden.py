"""Golden-value regression pins (SURVEY.md §4 test-strategy note).

One training step and the estimator suite on a fixed-seed tiny model must
keep producing these exact values (float32, CPU). If a refactor changes
numerics, the change must be intentional and these constants updated in the
same commit with a justification.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vae_lagging_encoder_tpu.config import get_config
from vae_lagging_encoder_tpu.data import BucketedPool, MonoTextData
from vae_lagging_encoder_tpu.data.synthetic import generate_synthetic_corpus
from vae_lagging_encoder_tpu.models import build_text_vae
from vae_lagging_encoder_tpu.train import make_loss_fn, make_train_epoch

# Recorded 2026-08-16 on jax 0.9.0 CPU f32.
# loss_after_epoch re-pinned in round 2 for two intentional semantic fixes,
# both torch-parity-verified (tests/test_torch_parity.py): (1) kl_weight now
# anneals BEFORE each step's update (reference order, ADVICE.md r1); (2) the
# LSTM biases are kept separate (b_ih, b_hh) so SGD moves both like the
# reference, instead of a single merged bias. loss0 (pure forward) is
# unchanged.
GOLDEN = {
    "loss0": 18.671021,
    "kl0": 0.0,
    "loss_after_epoch": 29.048641,
    "kl_weight_after": 1.0,
}

# Round-4 breadth (VERDICT r3 weak #5): pins for the two programs where a
# silent numeric regression would hurt most — an AGGRESSIVE fused epoch
# (lax.while_loop inner updates, plateau stop, decoder-only outer step) and
# the FINAL EVAL SUITE (ELBO / MI / AU / IW-NLL reducers).
# Regenerate: `PYTHONPATH=/root/repo:$PYTHONPATH python tests/test_golden.py`
# from the repo root (forces CPU f32 itself) and paste the printed dicts;
# constants may only change in a commit that justifies the numeric shift.
GOLDEN_AGGRESSIVE = {
    "loss_sum": 1859.1124,
    "rec_sum": 1859.1124,
    "kl_sum": 3e-06,        # KL collapses on this tiny plain-ELBO corpus
    "n_sents": 64.0,
    "n_words": 589.0,
    "inner_iters": 130,     # 8 outer steps, burn cap 20: some plateau-stop
    "kl_weight_after": 1.0,
}
GOLDEN_EVAL = {
    "elbo_loss": 29.292301,
    "mi": -0.11549,
    "au": 0,
    "iw_nll": 28.871183,
}


def setup():
    cfg = get_config("synthetic", ni=12, enc_nh=16, nz=3, dec_nh=16,
                     batch_size=8, dec_dropout_in=0.0, dec_dropout_out=0.0,
                     warm_up=1, length_buckets=(8, 16))
    sents, _ = generate_synthetic_corpus(num_sentences=64, vocab_size=20,
                                         min_len=4, max_len=12, seed=42)
    data = MonoTextData(sentences=sents)
    pool = BucketedPool(data.create_data_batch(8, cfg.length_buckets))
    vae = build_text_vae(cfg, len(data.vocab))
    params = vae.init(jax.random.PRNGKey(123))
    return cfg, pool, vae, params


def test_golden_step_and_epoch():
    cfg, pool, vae, params = setup()
    loss_fn = make_loss_fn(vae, train=False)
    batch = tuple(a[0] for a in pool.arrays[0])
    mean_loss, (ls, rs, ks, n, w) = loss_fn(params, jax.random.PRNGKey(7),
                                            batch, 1.0)
    np.testing.assert_allclose(float(mean_loss), GOLDEN["loss0"], rtol=2e-5)
    np.testing.assert_allclose(float(ks) / float(n), GOLDEN["kl0"], atol=2e-5)

    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)
    p, _, klw, sums, _ = epoch_fn(params, opt_init(params),
                                  jax.random.PRNGKey(9), jnp.float32(0.1),
                                  jnp.float32(1.0), order, aggressive=False)
    np.testing.assert_allclose(float(sums[0]) / float(sums[3]),
                               GOLDEN["loss_after_epoch"], rtol=2e-5)
    np.testing.assert_allclose(float(klw), GOLDEN["kl_weight_after"], rtol=1e-6)


def _run_aggressive_epoch():
    """One aggressive fused epoch on the fixed tiny setup (small burn caps
    so the inner while_loop both runs and plateau-stops)."""
    cfg, pool, vae, params = setup()
    cfg = cfg.replace(burn_max_iters=20, burn_window=5)
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)
    p, _, klw, sums, inner = epoch_fn(params, opt_init(params),
                                      jax.random.PRNGKey(9), jnp.float32(0.1),
                                      jnp.float32(1.0), order, aggressive=True)
    return [float(x) for x in sums], int(inner), float(klw)


def test_golden_aggressive_epoch():
    sums, inner, klw = _run_aggressive_epoch()
    g = GOLDEN_AGGRESSIVE
    np.testing.assert_allclose(
        sums, [g["loss_sum"], g["rec_sum"], g["kl_sum"], g["n_sents"],
               g["n_words"]], rtol=2e-5, atol=1e-4)
    assert inner == g["inner_iters"]
    np.testing.assert_allclose(klw, g["kl_weight_after"], rtol=1e-6)


def _run_eval_suite():
    """Final-eval estimators on params after one plain epoch (non-degenerate
    but deterministic). Mirrors train/loop.py's run_final_eval calls."""
    from vae_lagging_encoder_tpu.train.epoch import (make_au_fn, make_eval_fn,
                                                     make_iwnll_fn, make_mi_fn)

    cfg, pool, vae, params = setup()
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)
    p, _, _, _, _ = epoch_fn(params, opt_init(params), jax.random.PRNGKey(9),
                             jnp.float32(0.1), jnp.float32(1.0), order,
                             aggressive=False)
    key = jax.random.PRNGKey(17)
    elbo = make_eval_fn(vae, pool)(p, key)
    mi = make_mi_fn(vae, pool)(p, jax.random.fold_in(key, 1))
    au, _ = make_au_fn(vae, pool)(p, jax.random.fold_in(key, 2))
    iw = make_iwnll_fn(vae, pool, nsamples=20, ns=10)(
        p, jax.random.fold_in(key, 3))
    return {"elbo_loss": float(elbo["loss"]), "mi": float(mi), "au": int(au),
            "iw_nll": float(iw["nll"])}


def test_golden_final_eval_suite():
    got = _run_eval_suite()
    np.testing.assert_allclose(got["elbo_loss"], GOLDEN_EVAL["elbo_loss"],
                               rtol=2e-5)
    np.testing.assert_allclose(got["mi"], GOLDEN_EVAL["mi"], atol=2e-5)
    assert got["au"] == GOLDEN_EVAL["au"]
    np.testing.assert_allclose(got["iw_nll"], GOLDEN_EVAL["iw_nll"],
                               rtol=2e-5)


if __name__ == "__main__":
    # regenerate the constants — on CPU, like the pytest run (conftest.py)
    jax.config.update("jax_platforms", "cpu")
    cfg, pool, vae, params = setup()
    loss_fn = make_loss_fn(vae, train=False)
    batch = tuple(a[0] for a in pool.arrays[0])
    mean_loss, (ls, rs, ks, n, w) = loss_fn(params, jax.random.PRNGKey(7),
                                            batch, 1.0)
    epoch_fn, opt_init = make_train_epoch(vae, pool, cfg)
    order = jnp.arange(pool.num_batches, dtype=jnp.int32)
    p, _, klw, sums, _ = epoch_fn(params, opt_init(params),
                                  jax.random.PRNGKey(9), jnp.float32(0.1),
                                  jnp.float32(1.0), order, aggressive=False)
    print("GOLDEN =", {
        "loss0": round(float(mean_loss), 6),
        "kl0": round(float(ks) / float(n), 6),
        "loss_after_epoch": round(float(sums[0]) / float(sums[3]), 6),
        "kl_weight_after": float(klw)})
    asums, ainner, aklw = _run_aggressive_epoch()
    print("GOLDEN_AGGRESSIVE =", {
        "loss_sum": round(asums[0], 4), "rec_sum": round(asums[1], 4),
        "kl_sum": round(asums[2], 6), "n_sents": asums[3],
        "n_words": asums[4], "inner_iters": ainner,
        "kl_weight_after": aklw})
    ev = _run_eval_suite()
    print("GOLDEN_EVAL =", {k: (v if isinstance(v, int) else round(v, 6))
                            for k, v in ev.items()})
