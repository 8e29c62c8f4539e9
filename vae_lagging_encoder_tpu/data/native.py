"""ctypes bindings for the native host text pipeline (csrc/textproc.cpp).

The TPU compute path is JAX/XLA/Pallas; this is the native runtime around
it: corpus tokenization / vocab counting / id-encoding in C++ (flat hash
maps, single buffered pass) instead of per-token Python dict lookups —
the host-side startup cost that gates device utilization on Yahoo-scale
corpora. Loaded via ctypes (pybind11 isn't in this image); every caller
falls back to the pure-Python path when the shared object is unavailable.

Build (g++ is baked into the image):
    python -m vae_lagging_encoder_tpu.data.native --build
The .so is cached next to this file; builds are attempted lazily once.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "textproc.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_textproc.so")
_lib = None
_tried = False


class _TpVocabCounts(ctypes.Structure):
    _fields_ = [("words_blob", ctypes.c_char_p),
                ("words_blob_len", ctypes.c_int64),
                ("counts", ctypes.POINTER(ctypes.c_int64)),
                ("num_words", ctypes.c_int64),
                ("num_sentences", ctypes.c_int64),
                ("num_tokens", ctypes.c_int64)]


class _TpEncoded(ctypes.Structure):
    _fields_ = [("ids", ctypes.POINTER(ctypes.c_int32)),
                ("offsets", ctypes.POINTER(ctypes.c_int64)),
                ("labels", ctypes.POINTER(ctypes.c_int64)),
                ("num_sentences", ctypes.c_int64),
                ("num_ids", ctypes.c_int64)]


def build(verbose: bool = False) -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.isfile(src):
        return False
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if verbose:
            print(" ".join(cmd))
            print(out.stdout + out.stderr)
        return out.returncode == 0
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # A pip-installed tree ships the library as an ABI-suffixed extension
    # (setup.py builds Extension "...data._textproc" — loaded via ctypes, so
    # the missing PyInit symbol is irrelevant); a source checkout builds the
    # plain-named .so lazily next to this file. Candidates are tried
    # NEWEST-mtime first so a stale-but-loadable plain .so cannot shadow a
    # freshly built pip extension (ADVICE r4).
    import glob
    def _mtime(p):
        # a candidate deleted/replaced between the isfile filter and this
        # sort must not crash the host pipeline — sort it last; the CDLL
        # loop below then skips it via its own OSError handler
        try:
            return os.path.getmtime(p)
        except OSError:
            return float("-inf")

    cands = sorted(
        {p for p in (_SO, *glob.glob(
            os.path.join(os.path.dirname(__file__), "_textproc*.so")))
         if os.path.isfile(p)},
        key=_mtime, reverse=True)
    if not cands:
        if not build():
            return None
        cands = [_SO]
    for cand in cands:  # e.g. a stale plain .so next to a valid ABI one
        try:
            lib = ctypes.CDLL(cand)
            # bind symbols HERE: a loadable library missing a newer symbol
            # (stale build) must degrade to the next candidate / pure
            # Python, not crash the host pipeline (ADVICE r4)
            lib.tp_count_vocab.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                           ctypes.POINTER(_TpVocabCounts)]
            lib.tp_count_vocab.restype = ctypes.c_int
            lib.tp_encode_corpus.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(_TpEncoded)]
            lib.tp_encode_corpus.restype = ctypes.c_int
            lib.tp_free_counts.argtypes = [ctypes.POINTER(_TpVocabCounts)]
            lib.tp_free_encoded.argtypes = [ctypes.POINTER(_TpEncoded)]
            _lib = lib
            return _lib
        except (OSError, AttributeError):
            continue
    return None


def available() -> bool:
    return _load() is not None


def count_vocab(path: str, label_mode: bool) -> Optional[Tuple[List[str], np.ndarray]]:
    """(words ordered count-desc-then-lex, counts) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = _TpVocabCounts()
    if lib.tp_count_vocab(path.encode(), int(label_mode), ctypes.byref(out)):
        return None
    try:
        blob = ctypes.string_at(
            ctypes.cast(out.words_blob, ctypes.c_void_p), out.words_blob_len)
        words = blob.decode("utf-8").split("\n")[: out.num_words]
        counts = np.ctypeslib.as_array(out.counts, (out.num_words,)).copy()
        return words, counts
    finally:
        lib.tp_free_counts(ctypes.byref(out))


def encode_corpus(path: str, label_mode: bool, vocab_words: List[str],
                  unk_id: int, first_id: int
                  ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """CSR (ids, offsets, labels) with ids over the given vocab order, or
    None if unavailable. labels are -1 when absent."""
    lib = _load()
    if lib is None:
        return None
    blob = ("\n".join(vocab_words) + "\n").encode("utf-8")
    out = _TpEncoded()
    if lib.tp_encode_corpus(path.encode(), int(label_mode), blob,
                            len(blob), unk_id, first_id, ctypes.byref(out)):
        return None
    try:
        ids = np.ctypeslib.as_array(out.ids, (max(out.num_ids, 1),)).copy()
        offs = np.ctypeslib.as_array(out.offsets,
                                     (out.num_sentences + 1,)).copy()
        labels = np.ctypeslib.as_array(out.labels,
                                       (max(out.num_sentences, 1),)).copy()
        return ids[: out.num_ids], offs, labels[: out.num_sentences]
    finally:
        lib.tp_free_encoded(ctypes.byref(out))


if __name__ == "__main__":
    if "--build" in sys.argv:
        ok = build(verbose=True)
        print("built:", ok, "->", _SO if ok else "(failed)")
        sys.exit(0 if ok else 1)
