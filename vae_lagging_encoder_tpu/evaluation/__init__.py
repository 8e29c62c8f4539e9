"""Evaluation suite re-exports.

The fused reduce-over-pool implementations live in train/epoch.py (they
share the pool/switch machinery with training); this package is the
user-facing import point for the reference's evaluator set
(<ref>text.py §test/§calc_mi/§calc_au/§calc_iwnll — SURVEY.md §3.3).
"""
from ..train.epoch import (make_au_fn, make_eval_fn, make_iwnll_fn,
                           make_mi_fn)
from ..models.encoder import calc_mi, eval_inference_dist, gaussian_kl

__all__ = [
    "make_eval_fn", "make_mi_fn", "make_au_fn", "make_iwnll_fn",
    "calc_mi", "eval_inference_dist", "gaussian_kl",
]
