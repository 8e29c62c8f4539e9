from .optim import clip_by_global_norm, clip_scale, global_norm, sgd_update
from .aggressive import make_aggressive_inner
from .epoch import (binarize_prep, make_au_fn, make_eval_fn,
                    make_image_loss_fn, make_iwnll_fn, make_loss_fn,
                    make_mi_fn, make_pool_reducer, make_train_epoch)
from .checkpoint import load_checkpoint, save_checkpoint, to_host
from .loop import (load_text_datasets, run_final_eval, run_training,
                   train_image, train_text)

__all__ = [
    "clip_by_global_norm", "clip_scale", "global_norm", "sgd_update",
    "make_aggressive_inner", "make_train_epoch", "make_loss_fn",
    "make_eval_fn", "make_mi_fn", "make_au_fn", "make_iwnll_fn",
    "make_pool_reducer", "load_checkpoint", "save_checkpoint", "to_host",
    "train_text", "train_image", "load_text_datasets",
    "run_training", "run_final_eval", "make_image_loss_fn", "binarize_prep",
]
