"""Optimization primitives matching the reference's recipe.

Parity: <ref>text.py §main — TWO separate SGD optimizers (lr 1.0, no
momentum), one over encoder params, one over decoder params (load-bearing
for the aggressive algorithm); gradients of the WHOLE model are clipped to
global norm 5.0 before either optimizer steps (SURVEY.md §3.1/§3.2).

SGD without momentum is stateless, so "rebuilding the optimizer at a new
LR" (the reference's plateau-decay step) is just passing a different lr
scalar — we pass lr as a traced argument so decays never recompile.
Optional momentum keeps a velocity pytree for config parity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree)))


def clip_by_global_norm(tree, max_norm: float):
    """<ref>torch.nn.utils.clip_grad_norm_(vae.parameters(), 5.0) equivalent —
    the norm is over the FULL (enc+dec) gradient tree."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda x: x * scale, tree), norm


def init_velocity(params):
    return jax.tree.map(jnp.zeros_like, params)


def sgd_update(params, grads, lr, velocity=None, momentum: float = 0.0):
    """One SGD step. Returns (new_params, new_velocity)."""
    if momentum and velocity is not None:
        velocity = jax.tree.map(lambda v, g: momentum * v + g, velocity, grads)
        step_dir = velocity
    else:
        step_dir = grads
    params = jax.tree.map(lambda p, g: p - lr * g, params, step_dir)
    return params, velocity
