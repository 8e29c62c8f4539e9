from .dp import make_mesh, make_dp_train_step, shard_batch
from .tp import (clip_scale_tp, clip_tp, make_tp_eval_step, make_tp_loss_fn,
                 make_tp_mesh, make_tp_train_step, shard_params, shard_tree,
                 tp_token_logp, tree_pred_specs)

__all__ = ["make_mesh", "make_dp_train_step", "shard_batch",
           "make_tp_mesh", "make_tp_train_step", "make_tp_eval_step",
           "make_tp_loss_fn", "clip_tp", "clip_scale_tp", "shard_params",
           "shard_tree", "tp_token_logp", "tree_pred_specs"]
