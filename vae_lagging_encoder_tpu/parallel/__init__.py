from .dp import make_mesh, make_dp_train_step, shard_batch
from .tp import (make_tp_mesh, make_tp_train_step, make_tp_eval_step,
                 shard_params, tp_token_logp)

__all__ = ["make_mesh", "make_dp_train_step", "shard_batch",
           "make_tp_mesh", "make_tp_train_step", "make_tp_eval_step",
           "shard_params", "tp_token_logp"]
