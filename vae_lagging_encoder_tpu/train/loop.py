"""Host-side training drivers (text + image).

Parity: <ref>text.py §main / <ref>image.py §main (SURVEY.md §3.1/§3.4) —
the full lifecycle: KL-annealed training with separate enc/dec SGD, the
aggressive inner loop with its epoch-level MI-plateau permanent switch-off,
per-epoch validation ELBO, best-checkpoint saving, LR plateau decay WITH
rollback-to-best, and the final eval suite (ELBO / MI / AU / IW-NLL).

The host only orchestrates epoch boundaries; each epoch is one fused XLA
program (train/epoch.py). The rare host-side decisions (MI switch-off, LR
decay + param rollback) match the reference's semantics exactly because
they affect final numbers (SURVEY.md §7 hard parts 1 & 3). Text and image
share the same driver, differing only in data pools, the loss adapter
(dynamic binarization for images), and the eval prep hook.
"""
from __future__ import annotations

import math
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..data import (BucketedPool, ImagePool, MonoTextData,
                    ensure_synthetic_dataset, load_omniglot)
from ..models import build_image_vae, build_text_vae
from ..utils.exp_utils import Logger
from .checkpoint import load_checkpoint, save_checkpoint, to_host
from .epoch import (_unpack, binarize_prep, make_au_fn, make_eval_fn,
                    make_image_loss_fn, make_iwnll_fn, make_mi_fn,
                    make_train_epoch)


def dataset_is_labeled(cfg: ExperimentConfig) -> bool:
    """Whether corpus lines carry a leading "<label>\t". Explicit --label
    0/1 wins; default: the built-in text corpora are all labeled."""
    if cfg.label is not None:
        return bool(cfg.label)
    return cfg.dataset in ("yahoo", "yelp", "synthetic", "docs_english")


def load_text_datasets(cfg: ExperimentConfig):
    if cfg.dataset == "synthetic":
        ensure_synthetic_dataset()
    label = dataset_is_labeled(cfg)
    train = MonoTextData(cfg.train_data, label=label)
    val = MonoTextData(cfg.val_data, label=label, vocab=train.vocab)
    test = MonoTextData(cfg.test_data, label=label, vocab=train.vocab)
    return train, val, test


# Auto --epoch_segment defaults (batches per device dispatch). Sized from
# measurement: an aggressive outer step embeds ~10-100 inner encoder burns
# (32 outer steps = ~10.7 s device time at flagship shape, profile
# dossier), while a plain step is 2.5-7 ms — so plain epochs can take
# 8x longer dispatches and amortize the ~85-140 ms/dispatch tunnel
# overhead (experiments/segment_probe.py: seg 32 ran plain flagship
# epochs at ~75% of whole-epoch throughput; RESULTS.md).
AGGRESSIVE_SEGMENT = 32
PLAIN_SEGMENT = 256
# The final IW-NLL suite is ~50x a train step per batch; its reducer keeps
# the aggressive-sized bound when --epoch_segment is auto (a whole-pool
# IW dispatch over a 5k-sentence eval set measured ~86 s — killed by the
# tunnel watchdog; make_pool_reducer note).
EVAL_SEGMENT = 32


def pick_segment(cfg: ExperimentConfig, aggressive: bool,
                 num_batches: int) -> int:
    """Batches per device dispatch for one training epoch.

    Explicit ``--epoch_segment`` keeps exact legacy semantics: N = fixed,
    capped by ``log_niter`` so a log boundary exists at least every
    log_niter steps (the fused-epoch equivalent of the reference's
    per-step check); 0 = the whole epoch in one dispatch (no cap). The
    ``None`` default picks per mode — AGGRESSIVE_SEGMENT vs PLAIN_SEGMENT
    — trading the reference's exact 50-step log cadence for ~25% plain
    throughput (logs then flow every PLAIN_SEGMENT steps; set
    ``--epoch_segment 50`` to restore the old cadence exactly). Every
    path is capped by ``--autosave_niter``: autosaves fire only at
    segment boundaries, so the user's crash-loss window always wins over
    throughput — including explicit N and 0 (= whole epoch), where a
    wider-than-autosave dispatch would silently take no mid-epoch
    autosaves at all (ADVICE r4)."""
    if cfg.epoch_segment is None:
        seg = AGGRESSIVE_SEGMENT if aggressive else PLAIN_SEGMENT
    else:
        seg = cfg.epoch_segment or num_batches
        if cfg.epoch_segment and cfg.log_niter:
            seg = min(seg, cfg.log_niter)
    if cfg.autosave_niter:
        seg = min(seg, cfg.autosave_niter)
    return max(1, min(seg, num_batches))


def run_training(cfg: ExperimentConfig, vae, params, train_pool, val_pool,
                 test_pool, log: Logger, loss_fn: Callable | None = None,
                 eval_loss_fn: Callable | None = None,
                 prep: Callable = _unpack,
                 resume_state: Optional[Dict] = None,
                 _stop_after_segments: Optional[int] = None) -> Dict:
    """The shared lifecycle (see module docstring)."""
    if cfg.resume and not cfg.load_path:
        raise SystemExit("--resume requires --load_path (a checkpoint to "
                         "continue from)")
    if (cfg.iw_nsamples > cfg.iw_batch
            and cfg.iw_nsamples % cfg.iw_batch):
        # validate NOW: vae.nll_iw asserts this, but only in the FINAL eval
        # — failing there would discard the results of an hours-long run.
        # iw_nsamples <= iw_batch is always fine: the estimators clamp the
        # chunk to min(iw_batch, iw_nsamples) and run one chunk.
        raise SystemExit(
            f"--iw_nsamples {cfg.iw_nsamples} must be divisible by "
            f"--iw_batch {cfg.iw_batch} (the IW estimator runs in "
            f"iw_batch-sample chunks)")
    if cfg.warm_up <= 0 and cfg.kl_start < 1.0:
        raise SystemExit(
            f"--warm_up {cfg.warm_up} with --kl_start {cfg.kl_start}: a "
            "non-positive anneal window cannot reach kl_weight 1.0; use "
            "--kl_start 1.0 for no annealing or a positive --warm_up")
    mesh = None
    tp = cfg.tp_devices > 1
    shard_tree = lambda m, t: t  # identity unless TP re-binds it below
    if cfg.dp_devices > 1 or tp:
        # Data parallelism over ICI: batch-shard the device-resident pool
        # and run the fused epoch under shard_map with psum'd grads.
        # With --tp_devices the mesh gains a second axis vocab-sharding the
        # decoder's output projection + CE (parallel/tp.py).
        from ..parallel import make_mesh, make_tp_mesh
        from ..parallel import shard_tree as _shard_tree

        if cfg.batch_size % cfg.dp_devices:
            raise SystemExit(
                f"--batch_size {cfg.batch_size} must be divisible by "
                f"--dp_devices {cfg.dp_devices} (the batch dim is sharded "
                f"over the mesh; e.g. omniglot's default 50 needs 48 or 56 "
                f"on an 8-chip mesh)")
        if tp:
            if loss_fn is not None or not hasattr(vae.decoder, "vocab_size"):
                raise SystemExit(
                    "--tp_devices shards the TEXT decoder's [nh, V] output "
                    "projection; it does not apply to the image model")
            if vae.decoder.vocab_size % cfg.tp_devices:
                raise SystemExit(
                    f"vocab size {vae.decoder.vocab_size} must be divisible "
                    f"by --tp_devices {cfg.tp_devices} (the projection is "
                    f"column-sharded over the tp axis)")
            shard_tree = _shard_tree
            mesh = make_tp_mesh(cfg.dp_devices, cfg.tp_devices)
            params = shard_tree(mesh, params)
        else:
            mesh = make_mesh(cfg.dp_devices)
        train_pool.shard(mesh)  # batch dim over "dp"; replicated over "tp"
        log.info(f"[parallel] {'DPxTP' if tp else 'DP'} over mesh "
                 f"{dict(mesh.shape)}; pool batch-sharded"
                 + (f"; dec.pred vocab-sharded /{cfg.tp_devices}" if tp else ""))
    tp_ax = "tp" if tp else None
    epoch_fn, opt_init = make_train_epoch(vae, train_pool, cfg,
                                          loss_fn=loss_fn, mesh=mesh,
                                          tp_axis=tp_ax)
    opt_state = shard_tree(mesh, opt_init(params))
    # eval suite sharded over the same mesh (batch-parallel, SURVEY.md §7
    # step 7); eval pools stay replicated — only the train pool is sharded.
    # Under --tp_devices the reducers are vocab-sharded too (the ELBO loss
    # via make_tp_loss_fn, MI/AU are encoder-only): dec.pred stays
    # P(None, "tp") end to end — no per-eval all-gather, and each dp
    # group's tp members split the [N, V] projection work instead of
    # replicating it (VERDICT r4 weak #4).
    val_eval = make_eval_fn(vae, val_pool, loss_fn=eval_loss_fn, mesh=mesh,
                            tp_axis=tp_ax)
    val_mi = make_mi_fn(vae, val_pool, prep=prep, mesh=mesh, tp_axis=tp_ax)
    # <ref>text.py evaluates on the TEST set every test_nepoch epochs too
    test_eval = make_eval_fn(vae, test_pool, loss_fn=eval_loss_fn, mesh=mesh,
                             tp_axis=tp_ax)
    master_key = jax.random.PRNGKey(cfg.seed)

    kl_weight = float(cfg.kl_start)
    lr = float(cfg.lr)
    aggressive = bool(cfg.aggressive)
    pre_mi = 0.0
    best_loss = math.inf
    best_params = to_host(params)
    decay_cnt = 0
    not_improved = 0
    start_epoch = 0
    resume_mid = None
    save_path = cfg.save_path or f"models/{cfg.dataset}/model.ckpt"
    autosave_path = save_path + ".auto"
    if resume_state:
        # full mid-training resume — beyond the reference's best-params-only
        # checkpoints (SURVEY.md §5 checkpoint rebuild note)
        kl_weight = float(resume_state.get("kl_weight", kl_weight))
        lr = float(resume_state.get("lr", lr))
        aggressive = bool(resume_state.get("aggressive", aggressive))
        pre_mi = float(resume_state.get("pre_mi", pre_mi))
        best_loss = float(resume_state.get("best_loss",
                                           resume_state.get("val", {})
                                           .get("loss", best_loss)))
        decay_cnt = int(resume_state.get("decay_cnt", 0))
        not_improved = int(resume_state.get("not_improved", 0))
        resume_mid = resume_state.get("mid_epoch")
        if resume_mid:
            # periodic autosave: re-enter the SAME epoch at the segment
            # boundary after the save ("restart-from-step", SURVEY.md §5)
            start_epoch = int(resume_mid["epoch"])
            # The skipped-batch offset indexes into the seed-derived epoch
            # permutation; a different --seed (or a changed corpus) would
            # silently train/skip the wrong batches (ADVICE.md round 2).
            saved_seed = resume_mid.get("seed")
            if saved_seed is not None and int(saved_seed) != int(cfg.seed):
                raise SystemExit(
                    f"mid-epoch resume: autosave was written with --seed "
                    f"{int(saved_seed)} but this run uses --seed "
                    f"{int(cfg.seed)} — the epoch shuffle would diverge and "
                    f"the skipped-batch offset would be meaningless. Resume "
                    f"with the original seed.")
            saved_nb = resume_mid.get("num_batches")
            if (saved_nb is not None
                    and int(saved_nb) != int(train_pool.num_batches)):
                raise SystemExit(
                    f"mid-epoch resume: autosave expects "
                    f"{int(saved_nb)} train batches but the pool has "
                    f"{train_pool.num_batches} — the corpus or batching "
                    f"changed since the autosave; mid-epoch positions don't "
                    f"transfer.")
            if math.isfinite(best_loss):
                # the autosaved params are the CURRENT ones, not the best;
                # rollback-to-best must use the best-val checkpoint on disk
                if not os.path.exists(save_path):
                    raise SystemExit(
                        f"mid-epoch resume: a best-val checkpoint exists for "
                        f"this run (best_loss {best_loss:.4f}) but "
                        f"{save_path!r} is missing — LR-decay rollback and "
                        f"the final eval would silently use non-best params. "
                        f"Restore the best checkpoint or pass its "
                        f"--save_path.")
                best_params, _ = load_checkpoint(save_path)
        else:
            start_epoch = int(resume_state.get("epoch", -1)) + 1
        if "opt_state" in resume_state:
            # restore Adam moments / SGD velocity; without this, optimizers
            # with state silently reset on resume (ADVICE.md round 1)
            opt_state = shard_tree(
                mesh, jax.tree.map(jnp.asarray, resume_state["opt_state"]))
        log.info(f"[resume] from epoch {start_epoch}"
                 + (f" step {int(resume_mid['global_step'])}" if resume_mid
                    else "")
                 + f" (kl_weight {kl_weight:.4f}, lr {lr:.4f}, "
                 f"aggressive {aggressive})")
    rng = np.random.RandomState(cfg.seed)
    for _ in range(start_epoch):  # keep the shuffle stream aligned
        rng.permutation(train_pool.num_batches)
    history = []
    log.info(f"[train] {cfg.epochs} epochs, {train_pool.num_batches} "
             f"batches/epoch, aggressive={aggressive}")

    global_step = start_epoch * train_pool.num_batches
    report = tuple(0.0 for _ in range(5))
    steps_since_log = 0
    if resume_mid:
        global_step = int(resume_mid["global_step"])
        report = tuple(float(x) for x in resume_mid["report"])
        steps_since_log = int(resume_mid["steps_since_log"])
    last_autosave_step = global_step
    segments_run = 0
    t_start = time.time()

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        # Epoch segmentation: fixed-size order chunks, each one device
        # dispatch (bounded runtime; one extra compile for the remainder
        # size). Recomputed per epoch: the auto default depends on the
        # aggressive flag, which the MI plateau flips off permanently.
        seg = pick_segment(cfg, aggressive, train_pool.num_batches)
        order = rng.permutation(train_pool.num_batches).astype(np.int32)
        k_epoch = jax.random.fold_in(master_key, epoch)
        # SURVEY.md §5 tracing row: optional jax.profiler capture of the
        # first post-compile epoch (epoch 1; epoch 0 is compile-dominated)
        # — or whatever first epoch this run actually executes (--epochs 1,
        # resume), so --profile_dir never silently produces nothing.
        profiling = (cfg.profile_dir
                     and epoch == max(start_epoch, min(1, cfg.epochs - 1)))
        if profiling:
            jax.profiler.start_trace(cfg.profile_dir)
        sums = tuple(0.0 for _ in range(5))
        inner_iters = 0
        seg_skip_before = 0
        if resume_mid and epoch == start_epoch:
            sums = tuple(float(x) for x in resume_mid["sums"])
            inner_iters = int(resume_mid["inner_iters"])
            seg_skip_before = int(resume_mid["next_start"])
            # the skip is by batch offset, so the resume's segment grid must
            # line up with the autosave's, else untrained batches would be
            # silently dropped (epoch_segment/log_niter both change `seg`)
            if (seg_skip_before % seg != 0
                    and seg_skip_before != train_pool.num_batches):
                raise SystemExit(
                    f"mid-epoch resume: autosave position "
                    f"{seg_skip_before} is not a boundary of the current "
                    f"segmentation (seg={seg}; autosave was written with "
                    f"seg={resume_mid.get('seg', '?')}) — resume with the "
                    f"same --epoch_segment/--log_niter as the saved run.")
        kl_w_new = jnp.float32(kl_weight)
        for s, start in enumerate(range(0, len(order), seg)):
            if start < seg_skip_before:
                continue  # segments already trained before the autosave
            chunk = jnp.asarray(order[start:start + seg])
            params, opt_state, kl_w_new, seg_sums, seg_inner = epoch_fn(
                params, opt_state, jax.random.fold_in(k_epoch, s), kl_w_new,
                jnp.float32(lr), chunk, aggressive=aggressive)
            # Deliberate blocking pull each segment: it caps in-flight work
            # at one segment (the tunnel worker kills long unattended
            # executions) and feeds the log/autosave cadence. Cost bound:
            # one ~ms scalar pull per >=32-step segment, <2% of epoch time
            # at flagship scale — not worth async accumulation complexity.
            seg_sums = tuple(map(float, jax.device_get(seg_sums)))
            sums = tuple(a + b for a, b in zip(sums, seg_sums))
            inner_iters += int(seg_inner)
            # --- intra-epoch reporting every log_niter steps -------------
            # (parity: <ref>text.py prints {loss, recon, kl, kl_weight}
            # every log_niter iterations and resets the report sums)
            global_step += int(chunk.shape[0])
            steps_since_log += int(chunk.shape[0])
            report = tuple(a + b for a, b in zip(report, seg_sums))
            if cfg.log_niter and steps_since_log >= cfg.log_niter:
                rl, rr, rk, rn, _ = report
                rn = max(rn, 1.0)
                log.info(f"epoch {epoch}, iter {global_step}: "
                         f"avg_loss {rl / rn:.4f}, kl {rk / rn:.4f}, "
                         f"recon {rr / rn:.4f}, kl_weight "
                         f"{float(kl_w_new):.4f}, time {time.time() - t_start:.1f}s")
                report = tuple(0.0 for _ in range(5))
                steps_since_log = 0
            # --- periodic fault-tolerance autosave (SURVEY.md §5:
            # "restart-from-step") — full state incl. mid-epoch position;
            # atomic write, so a crash never leaves a torn autosave.
            if (cfg.autosave_niter
                    and global_step - last_autosave_step >= cfg.autosave_niter):
                last_autosave_step = global_step
                save_checkpoint(autosave_path, to_host(params), {
                    "opt_state": to_host(opt_state),
                    "epoch": epoch - 1, "kl_weight": float(kl_w_new),
                    "lr": lr, "aggressive": aggressive, "pre_mi": pre_mi,
                    "best_loss": best_loss, "decay_cnt": decay_cnt,
                    "not_improved": not_improved, "dataset": cfg.dataset,
                    "mid_epoch": {
                        "epoch": epoch, "seg": seg,
                        "seed": int(cfg.seed),
                        "num_batches": int(train_pool.num_batches),
                        "next_start": start + int(chunk.shape[0]),
                        "sums": list(sums), "inner_iters": int(inner_iters),
                        "report": list(report),
                        "steps_since_log": steps_since_log,
                        "global_step": global_step,
                    },
                })
            segments_run += 1
            if (_stop_after_segments is not None
                    and segments_run >= _stop_after_segments):
                # test hook: simulate a crash right after this segment
                if profiling:
                    jax.profiler.stop_trace()
                log.info(f"[stop] after {segments_run} segments (test hook)")
                return {"interrupted": True, "autosave_path": autosave_path,
                        "autosave_taken": os.path.exists(autosave_path)}
        # a mid-epoch-resumed epoch only ran the post-autosave tail in THIS
        # process: count only those steps, or steps/s (and the dossier's
        # per-step division) would divide the full epoch's counters by the
        # tail's wall time (code-review r3/r4)
        ran = train_pool.num_batches + int(inner_iters)
        if resume_mid and epoch == start_epoch:
            ran = (train_pool.num_batches - int(resume_mid["next_start"])
                   + int(inner_iters) - int(resume_mid["inner_iters"]))
        if profiling:
            # drain through a host pull — block_until_ready returns early
            # on the tunneled axon platform (verify SKILL.md trap #2)
            jax.device_get(kl_w_new)
            jax.profiler.stop_trace()
            log.info(f"[profile] trace for epoch {epoch} written to "
                     f"{cfg.profile_dir}")
            # auto-distill the trace into an op-level dossier (SURVEY.md §5
            # tracing row): self-time per op + HLO-category rollup, ms/step
            # over everything epoch 1 ran (outer steps + inner burns)
            from ..utils.profiling import write_dossier
            dossier_path = os.path.join(cfg.profile_dir, "DOSSIER.md")
            # ran == 0 when a mid-epoch autosave landed exactly at the epoch
            # end and the resumed epoch executed zero segments — distilling
            # would divide by zero (ADVICE r4)
            if ran <= 0:
                summary = None
                log.info("[profile] resumed epoch executed zero segments "
                         "(autosave landed exactly at the epoch boundary) "
                         "— nothing to distill, dossier skipped")
            else:
                summary = write_dossier(
                    cfg.profile_dir,
                    steps=ran,
                    out_path=dossier_path,
                    title=f"Epoch-{epoch} profiler dossier ({cfg.dataset})")
            if summary is None and ran > 0:
                log.info("[profile] no device timeline in the trace (CPU "
                         "backend runs emit none) — dossier skipped")
            else:
                top = summary["table"][0]
                log.info(
                    f"[profile] dossier -> {dossier_path}: "
                    f"{summary['ms_per_step_device']:.2f} ms/step device; "
                    f"top op {top['op']} ({top['category']}) "
                    f"{top['pct_device']:.0f}%")
        kl_weight = float(kl_w_new)
        loss_s, rec_s, kl_s, n_sent, n_words = sums
        dt = time.time() - t0
        log.info(f"epoch {epoch}: loss {loss_s / n_sent:.4f} "
                 f"rec {rec_s / n_sent:.4f} kl {kl_s / n_sent:.4f} "
                 f"kl_weight {kl_weight:.4f} inner_iters {int(inner_iters)} "
                 f"({dt:.1f}s, {ran / max(dt, 1e-9):.1f} steps/s"
                 f"{' post-resume' if resume_mid and epoch == start_epoch else ''})")

        # --- epoch-level MI plateau: permanent aggressive switch-off ----
        if aggressive:
            cur_mi = val_mi(params, jax.random.fold_in(master_key, 10_000 + epoch))
            log.info(f"epoch {epoch}: val MI {cur_mi:.4f} (prev {pre_mi:.4f})")
            if cur_mi < pre_mi:
                aggressive = False
                log.info(f"epoch {epoch}: MI plateau — aggressive OFF permanently")
            pre_mi = cur_mi

        # --- validation ELBO + best checkpoint + LR plateau decay -------
        val = val_eval(params, jax.random.fold_in(master_key, 20_000 + epoch))
        log.info(f"epoch {epoch}: VAL loss {val['loss']:.4f} rec {val['rec']:.4f} "
                 f"kl {val['kl']:.4f} nll {val['nll']:.4f} ppl {val['ppl']:.2f}")
        log.metric(epoch=epoch, train_loss=loss_s / n_sent, val_loss=val["loss"],
                   val_kl=val["kl"], kl_weight=kl_weight, lr=lr,
                   inner_iters=int(inner_iters), aggressive=aggressive,
                   epoch_seconds=dt)
        history.append({"epoch": epoch, **{f"val_{k}": v for k, v in val.items()}})

        if cfg.test_nepoch and (epoch + 1) % cfg.test_nepoch == 0:
            te = test_eval(params, jax.random.fold_in(master_key, 30_000 + epoch))
            log.info(f"epoch {epoch}: TEST loss {te['loss']:.4f} "
                     f"rec {te['rec']:.4f} kl {te['kl']:.4f} ppl {te['ppl']:.2f}")
            log.metric(epoch=epoch, split="test_cadence", **{
                k: float(v) for k, v in te.items()})

        if val["loss"] < best_loss:
            best_loss = val["loss"]
            best_params = to_host(params)
            not_improved = 0
            save_checkpoint(save_path, best_params, {
                "opt_state": to_host(opt_state),
                "epoch": epoch, "kl_weight": kl_weight, "lr": lr,
                "aggressive": aggressive, "pre_mi": pre_mi,
                "best_loss": best_loss, "decay_cnt": decay_cnt,
                "not_improved": not_improved,
                "val": {k: float(v) for k, v in val.items()},
                "dataset": cfg.dataset,
            })
        else:
            not_improved += 1
            if not_improved >= cfg.decay_epoch and epoch >= cfg.warm_up:
                # <ref>text.py §plateau decay: halve lr, RELOAD best params
                # (rollback-to-best), rebuild optimizers at the new lr.
                lr *= cfg.lr_decay
                decay_cnt += 1
                not_improved = 0
                params = shard_tree(mesh,
                                    jax.tree.map(jnp.asarray, best_params))
                # reference rebuilds both optimizers at the new lr -> fresh state
                opt_state = shard_tree(mesh, opt_init(params))
                log.info(f"epoch {epoch}: plateau — lr -> {lr:.4f} "
                         f"(decay {decay_cnt}/{cfg.max_decay}), rolled back to best")
                if decay_cnt >= cfg.max_decay:
                    log.info("max decays reached — stopping")
                    break

    params = jax.tree.map(jnp.asarray, best_params)
    results = run_final_eval(cfg, vae, params, test_pool, log,
                             eval_loss_fn=eval_loss_fn, prep=prep, mesh=mesh)
    results["history"] = history
    results["best_val_loss"] = best_loss
    results["save_path"] = save_path
    return results


def run_final_eval(cfg: ExperimentConfig, vae, params, pool, log: Logger,
                   eval_loss_fn: Callable | None = None,
                   prep: Callable = _unpack, mesh=None) -> Dict:
    """Final suite: ELBO decomposition, MI, AU, IW-NLL + PPL.

    Parity: <ref>text.py/image.py final block → test(), calc_mi(),
    calc_au(), calc_iwnll() (SURVEY.md §3.3). With ``mesh`` (or
    cfg.dp_devices > 1) every estimator is batch-parallel over the mesh;
    a ``tp`` mesh axis additionally vocab-shards the decoder likelihood
    inside ELBO and IW-NLL (``parallel.tp``), so the suite's FLOPs-heaviest
    path scales over tp instead of replicating (VERDICT r4 weak #4).
    """
    if (cfg.iw_nsamples > cfg.iw_batch
            and cfg.iw_nsamples % cfg.iw_batch):
        # validate FIRST (same guard as run_training): the IW reducer only
        # asserts this at its own trace, AFTER the ELBO/MI/AU passes —
        # failing there would discard hours of completed eval work on a
        # large test set when `--eval --iw_batch N` doesn't divide.
        # iw_nsamples <= iw_batch always works (one clamped chunk).
        raise SystemExit(
            f"--iw_nsamples {cfg.iw_nsamples} must be divisible by "
            f"--iw_batch {cfg.iw_batch} (the IW estimator runs in "
            f"iw_batch-sample chunks)")
    tp_ax = None
    if mesh is not None and dict(mesh.shape).get("tp", 1) > 1:
        tp_ax = "tp"
    elif mesh is None and cfg.dp_devices * cfg.tp_devices > 1:
        from ..parallel import make_mesh, make_tp_mesh
        if (cfg.tp_devices > 1 and hasattr(vae.decoder, "vocab_size")
                and vae.decoder.vocab_size % cfg.tp_devices == 0):
            # standalone `--eval --tp_devices N`: real (dp, tp) mesh with
            # the vocab-sharded estimators
            mesh = make_tp_mesh(cfg.dp_devices, cfg.tp_devices)
            tp_ax = "tp"
            log.info(f"[parallel] eval-only run: DPxTP mesh "
                     f"{dict(mesh.shape)}, dec.pred vocab-sharded")
        else:
            # image model / non-divisible vocab: fold the tp chips into the
            # batch-parallel axis instead of silently ignoring them
            mesh = make_mesh(cfg.dp_devices * cfg.tp_devices)
            if cfg.tp_devices > 1:
                log.info(f"[parallel] eval-only run: folding --tp_devices "
                         f"{cfg.tp_devices} into the batch-parallel axis "
                         f"(model not vocab-shardable)")
    if tp_ax is not None:
        # params may arrive dense (best-params rollup, a loaded checkpoint)
        # — place dec.pred on its vocab shards once, up front
        from ..parallel import shard_tree as _shard_tree
        params = _shard_tree(mesh, jax.tree.map(jnp.asarray, params))
    key = jax.random.PRNGKey(cfg.seed + 1)
    elbo = make_eval_fn(vae, pool, loss_fn=eval_loss_fn, mesh=mesh,
                        tp_axis=tp_ax)(params, key)
    mi = make_mi_fn(vae, pool, prep=prep, mesh=mesh, tp_axis=tp_ax)(
        params, jax.random.fold_in(key, 1))
    au, au_var = make_au_fn(vae, pool, prep=prep, mesh=mesh, tp_axis=tp_ax)(
        params, jax.random.fold_in(key, 2))
    # the IW reduction is segmented on the single-device path: at large
    # eval sets one whole-pool dispatch exceeds the tunnel worker's
    # unattended-kill horizon (make_pool_reducer note). Auto keeps the
    # small EVAL_SEGMENT bound (IW-500 is ~50x a train step per batch);
    # an explicit --epoch_segment carries over, 0 = unsegmented.
    iw_seg = (EVAL_SEGMENT if cfg.epoch_segment is None
              else cfg.epoch_segment or None)
    iw = make_iwnll_fn(vae, pool, nsamples=cfg.iw_nsamples, ns=cfg.iw_batch,
                       prep=prep, mesh=mesh, segment=iw_seg,
                       tp_axis=tp_ax)(
                           params, jax.random.fold_in(key, 3))
    results = {
        "elbo_loss": float(elbo["loss"]), "rec": float(elbo["rec"]),
        "kl": float(elbo["kl"]), "mi": float(mi), "au": int(au),
        "iw_nll": float(iw["nll"]), "iw_ppl": float(iw["ppl"]),
    }
    log.info(f"[TEST] rec {results['rec']:.4f} kl {results['kl']:.4f} "
             f"mi {results['mi']:.4f} au {results['au']} "
             f"iw-nll {results['iw_nll']:.4f} iw-ppl {results['iw_ppl']:.2f}")
    log.metric(split="test", **results)
    return results


# ---------------------------------------------------------------------------
def train_text(cfg: ExperimentConfig, logger: Optional[Logger] = None) -> Dict:
    log = logger or Logger()
    train_data, val_data, test_data = load_text_datasets(cfg)
    log.info(f"[data] train {len(train_data)} / val {len(val_data)} / "
             f"test {len(test_data)} sentences, vocab {len(train_data.vocab)}")
    mk = lambda d: BucketedPool(d.create_data_batch(cfg.batch_size,
                                                    cfg.length_buckets))
    train_pool, val_pool, test_pool = mk(train_data), mk(val_data), mk(test_data)
    log.info(f"[data] train batches {train_pool.num_batches} over buckets "
             f"{train_pool.lengths}")

    vae = build_text_vae(cfg, len(train_data.vocab))
    params = vae.init(jax.random.PRNGKey(cfg.seed))
    extra = {}
    if cfg.load_path:
        params, extra = load_checkpoint(cfg.load_path)
        log.info(f"[ckpt] loaded {cfg.load_path} (extra keys: {list(extra)})")
    if cfg.eval:
        return run_final_eval(cfg, vae, params, test_pool, log)
    return run_training(cfg, vae, params, train_pool, val_pool, test_pool, log,
                        resume_state=extra if cfg.resume else None)


def train_image(cfg: ExperimentConfig, logger: Optional[Logger] = None) -> Dict:
    log = logger or Logger()
    train_imgs, val_imgs, test_imgs = load_omniglot(cfg.train_data)
    log.info(f"[data] omniglot train {len(train_imgs)} / val {len(val_imgs)} / "
             f"test {len(test_imgs)} images")
    train_pool = ImagePool(train_imgs, cfg.batch_size)
    val_pool = ImagePool(val_imgs, cfg.batch_size)
    test_pool = ImagePool(test_imgs, cfg.batch_size)

    vae = build_image_vae(cfg)
    params = vae.init(jax.random.PRNGKey(cfg.seed))
    loss_fn = make_image_loss_fn(vae, nsamples=cfg.nsamples, train=True)
    eval_loss_fn = make_image_loss_fn(vae, nsamples=1, train=False)
    extra = {}
    if cfg.load_path:
        params, extra = load_checkpoint(cfg.load_path)
        log.info(f"[ckpt] loaded {cfg.load_path} (extra keys: {list(extra)})")
    if cfg.eval:
        return run_final_eval(cfg, vae, params, test_pool, log,
                              eval_loss_fn=eval_loss_fn, prep=binarize_prep)
    return run_training(cfg, vae, params, train_pool, val_pool, test_pool, log,
                        loss_fn=loss_fn, eval_loss_fn=eval_loss_fn,
                        prep=binarize_prep,
                        resume_state=extra if cfg.resume else None)
