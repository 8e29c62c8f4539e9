"""OmniGlot image data.

Parity: <ref>image.py §data loading — the reference ``torch.load``s
``datasets/omniglot_data/omniglot.pt`` (train/val/test grayscale-probability
tensors, 28x28) and applies **dynamic binarization**: a fresh
``torch.bernoulli(batch)`` every training step and at eval (SURVEY.md §3.4).

TPU-first: binarization happens **on device** as
``jax.random.bernoulli(key, probs)`` inside the jitted step (see
train/step.py), so the host pipeline only stages the probability tensors
once. This loader accepts the reference's .pt file (via the baked-in
CPU torch), an .npz equivalent, and — for offline test/bench use — a
deterministic synthetic substitute with OmniGlot's shapes and scale.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

# Reference dataset scale (SURVEY.md §6): 24,345 train / 8,070 test.
_SYNTH_SIZES = {"train": 2000, "val": 500, "test": 500}


def _as_prob_arrays(obj) -> Dict[str, np.ndarray]:
    """Normalize a loaded .pt/.npz payload to {split: float32 [N,28,28,1]}."""
    out = {}
    if hasattr(obj, "keys"):
        items = {k: obj[k] for k in obj.keys()}
    elif isinstance(obj, (list, tuple)):
        items = dict(zip(("train", "val", "test"), obj))
    else:
        items = {"train": obj}
    for k, v in items.items():
        arr = np.asarray(v, dtype=np.float32)
        if arr.ndim == 2:  # [N, 784]
            arr = arr.reshape(arr.shape[0], 28, 28, 1)
        elif arr.ndim == 3:  # [N, 28, 28]
            arr = arr[..., None]
        elif arr.ndim == 4 and arr.shape[1] == 1:  # NCHW -> NHWC
            arr = np.transpose(arr, (0, 2, 3, 1))
        if arr.max() > 1.0:
            arr = arr / 255.0
        key = {"valid": "val", "validation": "val"}.get(str(k).lower(), str(k).lower())
        out[key] = np.clip(arr, 0.0, 1.0)
    return out


def _synthetic_omniglot(seed: int = 783435) -> Dict[str, np.ndarray]:
    """Structured stroke-like probability images (offline substitute)."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:28, 0:28].astype(np.float32)
    out = {}
    for split, n in _SYNTH_SIZES.items():
        imgs = np.zeros((n, 28, 28, 1), np.float32)
        for i in range(n):
            img = np.zeros((28, 28), np.float32)
            for _ in range(rng.randint(2, 5)):  # a few gaussian "strokes"
                cy, cx = rng.uniform(4, 24, size=2)
                ang = rng.uniform(0, np.pi)
                l_, w_ = rng.uniform(3, 9), rng.uniform(0.6, 1.6)
                dy, dx = ys - cy, xs - cx
                u = dy * np.sin(ang) + dx * np.cos(ang)
                v = -dy * np.cos(ang) + dx * np.sin(ang)
                img += np.exp(-(u / l_) ** 2 - (v / w_) ** 2)
            imgs[i, :, :, 0] = np.clip(img, 0, 1)
        out[split] = imgs
    return out


def load_omniglot(path: str = "datasets/omniglot_data/omniglot.pt",
                  allow_synthetic: bool = True,
                  seed: int = 783435) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (train, val, test) float32 probability arrays [N, 28, 28, 1]."""
    data: Dict[str, np.ndarray] | None = None
    if path and os.path.isfile(path):
        if path.endswith(".npz"):
            data = _as_prob_arrays(np.load(path))
        else:
            import torch  # CPU torch is baked in; used only as a deserializer
            data = _as_prob_arrays(torch.load(path, map_location="cpu",
                                              weights_only=False))
    elif allow_synthetic:
        data = _synthetic_omniglot(seed)
    else:
        raise FileNotFoundError(
            f"{path} not found; run prepare_data.py (needs network) or pass "
            "allow_synthetic=True for the offline substitute")

    train = data.get("train")
    test = data.get("test")
    if test is None:  # carve test from the train tail, REMOVING it from
        # train so the val fallback below cannot overlap it (ADVICE.md r1)
        n_test = min(500, max(1, len(train) // 5))
        train, test = train[:-n_test], train[-n_test:]
    val = data.get("val")
    if val is None:  # reference carves val out of train when absent [MED]
        n_val = max(1, len(train) // 10)
        train, val = train[:-n_val], train[-n_val:]
    return train, val, test


def ensure_omniglot_dataset(root: str = "datasets/omniglot_data",
                            seed: int = 783435) -> str:
    """Materialize the offline synthetic substitute as an .npz; return path."""
    path = os.path.join(root, "omniglot_synthetic.npz")
    if not os.path.isfile(path):
        os.makedirs(root, exist_ok=True)
        np.savez_compressed(path, **_synthetic_omniglot(seed))
    return path


def image_batches(images: np.ndarray, batch_size: int,
                  drop_remainder: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Stack into [num_batches, B, 28, 28, 1] + row weights [num_batches, B].

    Partial final batch is zero-padded with row_weight 0 (same masking
    convention as TextBatch) so shapes are static.
    """
    n = len(images)
    num_batches = n // batch_size if drop_remainder else -(-n // batch_size)
    out = np.zeros((num_batches, batch_size) + images.shape[1:], images.dtype)
    w = np.zeros((num_batches, batch_size), np.float32)
    for i in range(num_batches):
        chunk = images[i * batch_size:(i + 1) * batch_size]
        out[i, : len(chunk)] = chunk
        w[i, : len(chunk)] = 1.0
    return out, w
