"""Checkpointing with full-resume state.

Parity: the reference persists only ``vae.state_dict()`` on each new best
validation ELBO and RELOADS that same file mid-training at every LR-plateau
decay — rollback-to-best is part of the optimization recipe, not just
persistence (<ref>text.py §plateau decay, SURVEY.md §5 checkpoint row).

We reproduce the rollback semantics exactly and go further (SURVEY.md §5
rebuild note): checkpoints carry optimizer/scheduler state — kl_weight,
lr, aggressive flag, MI history, decay counters, epoch, RNG key — so a
killed run restarts from its last epoch instead of from scratch.

Format: a pickle of host numpy pytrees (dependency-free, stable). The
pytree structure is whatever the model's ``init`` produced.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def to_host(tree):
    return jax.tree.map(np.asarray, jax.device_get(tree))


def save_checkpoint(path: str, params, extra: Dict[str, Any] | None = None) -> None:
    state = {"params": to_host(params), "extra": extra or {}}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(state, fh, protocol=4)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str):
    with open(path, "rb") as fh:
        state = pickle.load(fh)
    return state["params"], state.get("extra", {})
