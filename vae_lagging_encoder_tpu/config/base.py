"""Per-dataset experiment configuration.

Parity: <ref>config/config_{yahoo,yelp,omniglot,synthetic}.py §params — the
reference keeps a module-level ``params`` dict per dataset, merged into the
argparse namespace via importlib (CLI flags win). We mirror that with a typed
dataclass registry (``DATASET_CONFIGS``) merged the same way by the CLIs
(flags win; see cli/common.py). Flag names are kept reference-compatible:
``--dataset --aggressive --kl_start --warm_up --nsamples --iw_nsamples
--seed --eval --load_path`` (SURVEY.md §5 config row).

Hyperparameter values follow SURVEY.md §2 (conf MED on exact constants):
text ≈ {ni 512, enc_nh 1024, dec_nh 1024, nz 32, batch 32, epochs 100,
dec dropout 0.5}; omniglot ≈ {batch 50, epochs 500, nz 32}; synthetic uses
small nets with nz=1 for the posterior-mean-space tracing.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple


@dataclass
class ExperimentConfig:
    # --- identity -----------------------------------------------------
    dataset: str = "yahoo"
    model_type: str = "text"  # "text" (LSTM enc/dec) | "image" (ResNet+PixelCNN)

    # --- data ---------------------------------------------------------
    train_data: str = "datasets/yahoo_data/yahoo.train.txt"
    val_data: str = "datasets/yahoo_data/yahoo.valid.txt"
    test_data: str = "datasets/yahoo_data/yahoo.test.txt"
    batch_size: int = 32
    # TPU-first additions (no reference equivalent): pad+bucket batching
    # replaces the reference's length-homogeneous batches so step shapes are
    # static and few (SURVEY.md §7 step 1).
    length_buckets: Tuple[int, ...] = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512)

    # --- model (text) ---------------------------------------------------
    ni: int = 512       # word-embedding dim
    enc_nh: int = 1024  # encoder LSTM hidden dim
    dec_nh: int = 1024  # decoder LSTM hidden dim
    nz: int = 32        # latent dim
    dec_dropout_in: float = 0.5
    dec_dropout_out: float = 0.5

    # --- model (image) --------------------------------------------------
    img_size: Tuple[int, int, int] = (28, 28, 1)
    enc_layers: Tuple[int, ...] = (64, 64, 64)   # ResNet block widths
    dec_kernel_size: int = 7                     # PixelCNN first-layer kernel
    dec_layers: int = 8                          # PixelCNN depth
    dec_filters: int = 64                        # PixelCNN width

    # --- training -------------------------------------------------------
    epochs: int = 100
    optim: str = "sgd"            # "sgd" | "adam"; always separate enc/dec states
    lr: float = 1.0               # SGD lr 1.0, separate enc/dec optimizers
    momentum: float = 0.0
    clip_grad: float = 5.0        # global-norm clip over ALL params
    kl_start: float = 0.1         # KL-annealing start weight
    warm_up: int = 10             # epochs to anneal KL weight to 1.0
    aggressive: bool = False      # the paper's lagging-encoder inner loop
    burn_max_iters: int = 100     # inner-loop hard cap (sub-iters)
    burn_window: int = 15         # plateau window (sub-iters per check)
    decay_epoch: int = 2          # epochs without val improvement before LR decay
    lr_decay: float = 0.5
    max_decay: int = 5            # stop after this many decays
    nsamples: int = 1             # z samples per x during training
    seed: int = 783435

    # --- evaluation -------------------------------------------------------
    iw_nsamples: int = 500        # importance-weighted NLL samples
    iw_batch: int = 100           # IW chunk size (ns in <ref>vae.nll_iw)
    eval: bool = False
    load_path: str = ""
    resume: bool = False          # continue training from load_path's state
    test_nepoch: int = 5          # eval-on-test cadence (epochs)

    # --- bookkeeping -------------------------------------------------------
    log_niter: int = 50
    save_path: str = ""
    exp_dir: str = ""
    profile_dir: str = ""   # capture a jax.profiler trace of one epoch here
    # None = auto (the built-in yahoo/yelp/synthetic/docs_english corpora
    # are "<label>\t<sentence>"-formatted); an explicit --label 0/1 wins —
    # previously `or`-combined so --label 0 could never disable labeled
    # parsing of a custom --train_data (code-review r3)
    label: bool | None = None

    # --- TPU-first additions ---------------------------------------------
    # "float32" | "bfloat16" (matmul inputs). f32 is the measured default on
    # BOTH paths: TPU default matmul precision already runs bf16 multiplies
    # with f32 accumulation, so explicit bf16 only adds cast traffic —
    # image 2.50 vs 2.15 ms/step, text 157.6 vs 167.9 steps/s (RESULTS.md
    # "Measured negative results").
    compute_dtype: str = "float32"
    use_pallas: bool = False         # fused Pallas LSTM recurrent kernel
    # max batches per device dispatch inside an epoch. Bounds
    # single-execution runtime — the tunneled TPU worker watchdog kills
    # multi-minute unattended executions — and gives reference-style
    # intra-epoch progress. None (default) = auto per mode: 32 while
    # aggressive (each outer step embeds ~10-100 inner burns; ~10.7 s
    # device time at 32, profile dossier) vs 256 for plain epochs (~2.5-7
    # ms/step, so 256 stays under 2 s while amortizing the measured
    # ~85-140 ms/dispatch tunnel overhead — segment probe, RESULTS.md:
    # seg 32 ran plain epochs at ~75% of whole-epoch throughput).
    # Explicit N = fixed (capped by log_niter, exact log cadence);
    # 0 = whole epoch in one dispatch.
    epoch_segment: int | None = None
    dp_devices: int = 1              # data-parallel shards over the mesh
    # tensor-parallel shards: the decoder's [nh, V] output projection and
    # its CE are vocab-sharded over a second mesh axis (parallel/tp.py,
    # distributed online-logsumexp + column-parallel VJP). Text models
    # only; vocab must divide by it. Composes with dp (needs dp*tp devices).
    tp_devices: int = 1
    # unroll factor for the fused plain-epoch fori_loop (static bounds →
    # lax.scan): >1 packs several training steps into one loop body, so the
    # ~54 MB param carry crosses the loop boundary once per `loop_unroll`
    # steps. Bit-exact at any factor (tests/test_train.py). Measured on
    # v5e-1 at flagship yahoo shape (experiments/unroll_probe.py): NEUTRAL
    # (168.5 vs 168.9 steps/s at 4 vs 1) while compile grows 58s->296s —
    # XLA already buffer-aliases the scan carry, so the profile dossier's
    # copy bucket is not unroll-addressable. Kept as a tuning lever for
    # other shapes; leave at 1 on v5e. Aggressive epochs ignore it.
    loop_unroll: int = 1
    # periodic fault-tolerance autosave every N training steps to
    # <save_path>.auto, incl. mid-epoch position — --resume restarts from
    # the exact segment boundary (SURVEY.md §5 failure-detection rebuild
    # note: "restart-from-step"). 0 = off (reference-parity behavior:
    # best-val checkpoints only).
    autosave_niter: int = 0

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def _text_cfg(name: str, **kw) -> ExperimentConfig:
    base = dict(
        dataset=name,
        model_type="text",
        train_data=f"datasets/{name}_data/{name}.train.txt",
        val_data=f"datasets/{name}_data/{name}.valid.txt",
        test_data=f"datasets/{name}_data/{name}.test.txt",
    )
    base.update(kw)
    return ExperimentConfig(**base)


DATASET_CONFIGS = {
    # <ref>config/config_yahoo.py §params; use_pallas: fused VMEM-resident
    # LSTM kernel (ops/lstm_pallas.py) — 459 vs 335 steps/s on v5e,
    # bit-identical to the scan path under TPU default matmul precision.
    "yahoo": _text_cfg("yahoo", ni=512, enc_nh=1024, dec_nh=1024, nz=32,
                       batch_size=32, epochs=100, warm_up=10, kl_start=0.1,
                       use_pallas=True),
    # <ref>config/config_yelp.py §params
    "yelp": _text_cfg("yelp", ni=512, enc_nh=1024, dec_nh=1024, nz=32,
                      batch_size=32, epochs=100, warm_up=10, kl_start=0.1,
                      use_pallas=True),
    # TPU-build addition (no reference equivalent): REAL-English corpus
    # harvested from on-box package docstrings (data/english.py) at yahoo
    # dims/recipe — the closest available stand-in for the reference's
    # natural-language corpora on this zero-egress box.
    "docs_english": _text_cfg("docs_english", ni=512, enc_nh=1024,
                              dec_nh=1024, nz=32, batch_size=32, epochs=100,
                              warm_up=10, kl_start=0.1, use_pallas=True),
    # <ref>config/config_synthetic.py §params — small nets, nz=1 for the
    # posterior-mean-space tracing experiment.
    "synthetic": _text_cfg("synthetic", ni=50, enc_nh=50, dec_nh=50, nz=1,
                           batch_size=32, epochs=40, warm_up=10, kl_start=0.1,
                           dec_dropout_in=0.0, dec_dropout_out=0.0,
                           length_buckets=(8, 16, 24, 32, 48, 64)),
    # <ref>config/config_omniglot.py §params
    # [MED] The reference's image optimizer could not be ground-truthed
    # (empty mount); SGD lr=1.0 + clip 5.0 diverges on the PixelCNN stack
    # here, so the default is Adam 1e-3 (standard for PixelCNN training and
    # sufficient for the paper's ~89-nat OmniGlot NLL); --optim/--lr
    # override restores the SGD recipe if the reference turns out to use it.
    "omniglot": ExperimentConfig(
        dataset="omniglot", model_type="image",
        train_data="datasets/omniglot_data/omniglot.pt",
        val_data="", test_data="",
        batch_size=50, epochs=500, nz=32, warm_up=10, kl_start=0.1,
        optim="adam", lr=1e-3,
        dec_dropout_in=0.0, dec_dropout_out=0.0,
    ),
}


def get_config(dataset: str, **overrides) -> ExperimentConfig:
    """Look up the per-dataset config and apply CLI overrides (flags win)."""
    if dataset not in DATASET_CONFIGS:
        raise KeyError(f"unknown dataset {dataset!r}; known: {sorted(DATASET_CONFIGS)}")
    return DATASET_CONFIGS[dataset].replace(**overrides)
