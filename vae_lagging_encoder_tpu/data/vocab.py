"""Vocabulary with the reference's special tokens.

Parity: <ref>data/ §VocabEntry — word2id/id2word built from the *train* file
only and reused for val/test; specials ``<pad> <unk> <s> </s>``; unknown
words at val/test time map to ``<unk>`` (SURVEY.md §2 text-data row).
"""
from __future__ import annotations

import re
from typing import Dict, Iterable, List

PAD, UNK, BOS, EOS = "<pad>", "<unk>", "<s>", "</s>"
PAD_ID, UNK_ID, BOS_ID, EOS_ID = 0, 1, 2, 3
_SPECIALS = (PAD, UNK, BOS, EOS)

_ASCII_WS = re.compile(r"[^ \t\r\n\v\f]+")
_LEADING_INT = re.compile(r"^\s*[+-]?\d+")


def _ws_split(s: str) -> List[str]:
    """ASCII-whitespace tokenization — bit-identical to the native reader's
    ``is_space`` over raw bytes (csrc/textproc.cpp). Python's bare
    ``str.split()`` would ALSO split Unicode whitespace (U+00A0 etc.),
    silently diverging the fallback corpus from the native one
    (code-review r3)."""
    return _ASCII_WS.findall(s)


def _strtol(s: str) -> int:
    """C ``strtol`` semantics for label fields: leading integer, else 0 —
    what the native reader does; ``int(s)`` would instead crash the
    fallback on non-numeric labels (code-review r3)."""
    m = _LEADING_INT.match(s)
    return int(m.group(0)) if m else 0


class Vocab:
    def __init__(self, word2id: Dict[str, int]):
        for i, sp in enumerate(_SPECIALS):
            if word2id.get(sp) != i:
                raise ValueError(f"special {sp!r} must have id {i}")
        self.word2id = word2id
        self.id2word_ = [None] * len(word2id)
        for w, i in word2id.items():
            self.id2word_[i] = w

    # --- construction -------------------------------------------------
    @classmethod
    def from_corpus(cls, sentences: Iterable[List[str]], max_size: int | None = None,
                    min_freq: int = 1) -> "Vocab":
        counts: Dict[str, int] = {}
        for sent in sentences:
            for w in sent:
                counts[w] = counts.get(w, 0) + 1
        word2id = {sp: i for i, sp in enumerate(_SPECIALS)}
        # Deterministic order: frequency desc, then lexicographic.
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, c in ordered:
            if w in word2id or c < min_freq:
                continue
            if max_size is not None and len(word2id) >= max_size + len(_SPECIALS):
                break
            word2id[w] = len(word2id)
        return cls(word2id)

    @classmethod
    def from_counts(cls, ordered_words, counts, max_size=None,
                    min_freq: int = 1) -> "Vocab":
        """Build from (word, count) pairs already ordered count-desc/lex."""
        word2id = {sp: i for i, sp in enumerate(_SPECIALS)}
        for w, c in zip(ordered_words, counts):
            if w in word2id or c < min_freq:
                continue
            if max_size is not None and len(word2id) >= max_size + len(_SPECIALS):
                break
            word2id[w] = len(word2id)
        return cls(word2id)

    @classmethod
    def from_file(cls, path: str, label: bool = False, **kw) -> "Vocab":
        # native fast path (csrc/textproc.cpp) with pure-Python fallback —
        # _ws_split keeps the fallback's tokenization bit-identical to the
        # native reader's ASCII is_space (code-review r3)
        from . import native

        nc = native.count_vocab(path, label)
        if nc is not None:
            return cls.from_counts(*nc, **kw)
        with open(path) as fh:
            if label:
                return cls.from_corpus(
                    (_ws_split(line.split("\t", 1)[-1]) for line in fh), **kw)
            return cls.from_corpus((_ws_split(line) for line in fh), **kw)

    # --- lookup ---------------------------------------------------------
    def __len__(self) -> int:
        return len(self.word2id)

    def __getitem__(self, word: str) -> int:
        return self.word2id.get(word, UNK_ID)

    def id2word(self, wid: int) -> str:
        return self.id2word_[wid]

    def encode(self, words: List[str]) -> List[int]:
        """<s> w1 ... wn </s> as ids (reference wraps every sentence)."""
        return [BOS_ID] + [self[w] for w in words] + [EOS_ID]

    def decode(self, ids: Iterable[int], strip_specials: bool = True) -> List[str]:
        out = []
        for i in ids:
            w = self.id2word_[i]
            if strip_specials and w in _SPECIALS:
                continue
            out.append(w)
        return out
