"""Checkpointing with full-resume state.

Parity: the reference persists only ``vae.state_dict()`` on each new best
validation ELBO and RELOADS that same file mid-training at every LR-plateau
decay — rollback-to-best is part of the optimization recipe, not just
persistence (<ref>text.py §plateau decay, SURVEY.md §5 checkpoint row).

We reproduce the rollback semantics exactly and go further (SURVEY.md §5
rebuild note): checkpoints carry optimizer state (the enc/dec SGD/Adam
pytrees) plus scheduler state — kl_weight, lr, aggressive flag, MI history,
decay counters, epoch — so a killed run restarts from its last epoch
instead of from scratch.

Format: a flat-array ``.npz`` archive (zip of raw numpy arrays — no
executable content, loadable with ``allow_pickle=False``). The pytree
structure (nested dicts/lists/tuples and non-array scalars) is stored as a
JSON skeleton in the archive. Legacy round-1 pickle checkpoints are still
readable through a restricted unpickler that admits only numpy array
reconstruction — never arbitrary callables.
"""
from __future__ import annotations

import io
import json
import os
import pickle
from typing import Any, Dict, Tuple

import jax
import numpy as np


def to_host(tree):
    return jax.tree.map(np.asarray, jax.device_get(tree))


# ---------------------------------------------------------------------------
# pytree <-> (JSON skeleton, {name: ndarray})

def _encode(node, arrays: Dict[str, np.ndarray]):
    if isinstance(node, dict):
        return {"t": "d", "v": {str(k): _encode(v, arrays)
                                for k, v in node.items()}}
    if isinstance(node, (list, tuple)):
        return {"t": "l" if isinstance(node, list) else "u",
                "v": [_encode(v, arrays) for v in node]}
    if hasattr(node, "shape") and hasattr(node, "dtype"):
        name = f"a{len(arrays)}"
        arrays[name] = np.asarray(node)
        return {"t": "a", "v": name}
    if isinstance(node, (np.floating, np.integer, np.bool_)):
        node = node.item()
    return {"t": "v", "v": node}  # str / int / float / bool / None


def _decode(skel, arrays):
    t, v = skel["t"], skel["v"]
    if t == "d":
        return {k: _decode(s, arrays) for k, s in v.items()}
    if t == "l":
        return [_decode(s, arrays) for s in v]
    if t == "u":
        return tuple(_decode(s, arrays) for s in v)
    if t == "a":
        return arrays[v]
    return v


def save_checkpoint(path: str, params, extra: Dict[str, Any] | None = None) -> None:
    arrays: Dict[str, np.ndarray] = {}
    skel = _encode({"params": params, "extra": extra or {}}, arrays)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, __tree__=np.frombuffer(
            json.dumps(skel).encode("utf-8"), dtype=np.uint8), **arrays)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


class _NumpyOnlyUnpickler(pickle.Unpickler):
    """Legacy-pickle reader: permits numpy array/scalar reconstruction only
    (no arbitrary classes/callables -> no code execution on load)."""

    _OK = {"_reconstruct", "ndarray", "dtype", "scalar", "_frombuffer"}

    def find_class(self, module, name):
        if (module.split(".")[0] == "numpy"
                and (name in self._OK or module == "numpy.dtypes")):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"checkpoint requested forbidden global {module}.{name}")


def load_checkpoint(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint in any of the formats a user may arrive with:

    - this framework's ``.npz`` archive (the current format);
    - this framework's legacy round-1 pickle (restricted unpickler);
    - a REFERENCE ``torch.save(vae.state_dict())`` file — detected by the
      torch zip layout (``data.pkl`` member) or the legacy torch magic,
      converted on the fly via ``utils.torch_import`` so ``--load_path
      reference_model.pt`` works directly for eval/generation/fine-tuning.
    """
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic[:2] == b"PK":  # zip: ours (.npz) or a modern torch archive
        import zipfile
        with zipfile.ZipFile(path) as zf:
            is_torch = any(n.endswith("data.pkl") for n in zf.namelist())
        if is_torch:
            from ..utils.torch_import import load_torch_checkpoint
            return load_torch_checkpoint(path)
        with np.load(path, allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files if k != "__tree__"}
            skel = json.loads(z["__tree__"].tobytes().decode("utf-8"))
        state = _decode(skel, arrays)
    else:  # legacy round-1 pickle, or a legacy (pre-1.6) torch save
        try:
            with open(path, "rb") as fh:
                state = _NumpyOnlyUnpickler(fh).load()
            if not (isinstance(state, dict) and "params" in state):
                # a legacy torch save's first pickle is its magic number,
                # which unpickles "fine" but is not our state dict
                raise pickle.UnpicklingError("not a framework checkpoint")
        except pickle.UnpicklingError as our_err:
            from ..utils.torch_import import load_torch_checkpoint
            try:
                return load_torch_checkpoint(path)
            except Exception as torch_err:
                # hostile or corrupt: rejected by BOTH safe loaders — report
                # ours first so the user isn't debugging a torch traceback
                # for a file that was never a torch checkpoint
                raise pickle.UnpicklingError(
                    f"{path}: not a loadable checkpoint — framework reader: "
                    f"{our_err}; torch weights_only reader: "
                    f"{type(torch_err).__name__}: {torch_err}") from None
    return state["params"], state.get("extra", {})
