"""Numerically stable helpers.

Parity: <ref>modules/utils.py §log_sum_exp — the reference's only numeric
utility, used by the MI estimator and the importance-weighted NLL.
On TPU we delegate to ``jax.nn.logsumexp`` (XLA fuses the max/exp/sum chain);
the wrapper keeps the reference's calling convention.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.nn import logsumexp as _logsumexp


def log_sum_exp(value: jnp.ndarray, dim: int = -1, keepdim: bool = False) -> jnp.ndarray:
    """Stable log(sum(exp(value))) along ``dim``.

    Matches <ref>modules/utils.py §log_sum_exp(value, dim, keepdim).
    """
    return _logsumexp(value, axis=dim, keepdims=keepdim)
