"""Monolingual text corpus → static-shape padded+bucketed device batches.

Parity: <ref>data/ §MonoTextData — whitespace-tokenized corpus wrapped in
``<s> ... </s>``, batched so every batch is shape-homogeneous, returned as
integer tensors ready for the device (SURVEY.md §2 text-data row).

TPU-first redesign (SURVEY.md §7 step 1): the reference groups sentences by
*identical* length so it never pads. On TPU that would mean one XLA
compilation per distinct sentence length; instead we **pad + bucket** to a
small fixed set of lengths (few compilations, static shapes) and make the
padding mathematically invisible via masks:

- ``mask[b, t] = 1`` for real tokens (including <s> and </s>), else 0.
- partial batches are padded up to ``batch_size`` with all-pad rows whose
  ``row_weight`` is 0, so sums/means over a batch are exact.

The masked cross-entropy in the decoder multiplies by ``mask[:, 1:]`` so a
padded batch reproduces the reference's per-sentence NLL bit-for-bit in
exact arithmetic (tests/test_data.py, tests/test_losses.py property-test
this against a no-padding oracle).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .vocab import Vocab, PAD_ID, _strtol, _ws_split


@dataclass(frozen=True)
class TextBatch:
    """One device-ready batch of sentences.

    tokens:     int32  [B, L]   — <s> w1..wn </s> <pad>...
    mask:       float32[B, L]   — 1.0 on real tokens, 0.0 on padding
    row_weight: float32[B]      — 1.0 for real sentences, 0.0 for pad rows
    """

    tokens: np.ndarray
    mask: np.ndarray
    row_weight: np.ndarray

    @property
    def batch_size(self) -> int:
        return int(self.tokens.shape[0])

    @property
    def seq_len(self) -> int:
        return int(self.tokens.shape[1])

    @property
    def num_sentences(self) -> float:
        return float(self.row_weight.sum())

    @property
    def num_words(self) -> float:
        """Predicted tokens per reference convention: w1..wn plus </s>
        (everything after <s>), i.e. len(sent)-1 per sentence."""
        return float(self.mask[:, 1:].sum())


DEFAULT_BUCKETS = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512)


def _bucket_for(length: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if length <= b:
            return b
    # Overflow bucket: round up to a multiple of 16 (keeps the shape set tiny).
    return ((length + 15) // 16) * 16


class MonoTextData:
    """Corpus container mirroring <ref>data/ §MonoTextData's API surface."""

    def __init__(self, fname: Optional[str] = None, vocab: Optional[Vocab] = None,
                 label: bool = False, max_vocab: Optional[int] = None,
                 sentences: Optional[List[List[str]]] = None,
                 labels: Optional[List[int]] = None):
        if sentences is None:
            if fname is None:
                raise ValueError("need fname or sentences")
            # native fast path: vocab build + CSR id-encoding in C++
            # (data/native.py; falls back to the Python reader below)
            from . import native
            from .vocab import BOS_ID, EOS_ID, UNK_ID, _SPECIALS

            if vocab is None:
                nv = native.count_vocab(fname, label)
                if nv is not None:
                    vocab = Vocab.from_counts(*nv, max_size=max_vocab)
            if vocab is not None:
                words = [vocab.id2word_[i]
                         for i in range(len(_SPECIALS), len(vocab))]
                enc = native.encode_corpus(fname, label, words,
                                           unk_id=UNK_ID,
                                           first_id=len(_SPECIALS))
                if enc is not None:
                    ids, offs, lab = enc
                    self.vocab = vocab
                    self.labels = ([int(x) for x in lab] if label else None)
                    self.data = [
                        [BOS_ID] + ids[offs[i]:offs[i + 1]].tolist() + [EOS_ID]
                        for i in range(len(offs) - 1)]
                    return
            sentences, labels = self._read(fname, label)
        self.labels = labels
        if vocab is None:
            vocab = Vocab.from_corpus(sentences, max_size=max_vocab)
        self.vocab = vocab
        self.data: List[List[int]] = [vocab.encode(s) for s in sentences]

    @staticmethod
    def _read(fname: str, label: bool) -> Tuple[List[List[str]], Optional[List[int]]]:
        """Pure-Python reader, BIT-IDENTICAL to the native fast path
        (csrc/textproc.cpp) so a corpus yields the same dataset whether or
        not the .so built on this host (code-review r3): ASCII-whitespace
        tokenization (the native reader's is_space over raw bytes; Python's
        bare str.split would also split U+00A0 etc.), labeled lines with an
        EMPTY body are skipped entirely, and labels parse strtol-style
        (leading integer, else 0). Exact-parity tests: tests/test_native.py."""
        sentences, labels = [], [] if label else None
        with open(fname) as fh:
            for line in fh:
                if label:
                    # Reference corpora store "<label>\t<sentence>" for
                    # Yahoo/Yelp; the label is kept but unused by training.
                    split = line.split("\t", 1)
                    toks = _ws_split(split[-1])
                    if not toks:
                        continue
                    if len(split) == 2:
                        labels.append(_strtol(split[0]))
                    else:
                        # keep labels index-aligned with sentences (same
                        # sentinel as csrc/textproc.cpp)
                        labels.append(-1)
                else:
                    toks = _ws_split(line)
                    if not toks:
                        continue
                sentences.append(toks)
        return sentences, labels

    def __len__(self) -> int:
        return len(self.data)

    # ------------------------------------------------------------------
    def create_data_batch(self, batch_size: int,
                          buckets: Sequence[int] = DEFAULT_BUCKETS,
                          drop_remainder: bool = False,
                          seed: Optional[int] = None) -> List[TextBatch]:
        """All batches, padded+bucketed, batch dim always ``batch_size``.

        Mirrors <ref>data/ §MonoTextData.create_data_batch, which returns the
        full list of batches staged once; shuffling across epochs happens on
        the batch list (as in the reference's step loop).
        """
        by_bucket: Dict[int, List[List[int]]] = {}
        order = np.arange(len(self.data))
        if seed is not None:
            np.random.RandomState(seed).shuffle(order)
        for idx in order:
            sent = self.data[idx]
            by_bucket.setdefault(_bucket_for(len(sent), buckets), []).append(sent)

        batches: List[TextBatch] = []
        for blen in sorted(by_bucket):
            group = by_bucket[blen]
            for i in range(0, len(group), batch_size):
                chunk = group[i:i + batch_size]
                if len(chunk) < batch_size and drop_remainder:
                    continue
                batches.append(self._pad_batch(chunk, blen, batch_size))
        return batches

    @staticmethod
    def _pad_batch(sents: List[List[int]], seq_len: int, batch_size: int) -> TextBatch:
        tokens = np.full((batch_size, seq_len), PAD_ID, dtype=np.int32)
        mask = np.zeros((batch_size, seq_len), dtype=np.float32)
        row_weight = np.zeros((batch_size,), dtype=np.float32)
        for r, s in enumerate(sents):
            tokens[r, : len(s)] = s
            mask[r, : len(s)] = 1.0
            row_weight[r] = 1.0
        return TextBatch(tokens=tokens, mask=mask, row_weight=row_weight)

    # ------------------------------------------------------------------
    def data_iter(self, batch_size: int, seed: Optional[int] = None,
                  buckets: Sequence[int] = DEFAULT_BUCKETS,
                  shuffle: bool = True):
        """Yield one epoch of batches in (optionally) shuffled order —
        parity with <ref>data/ §MonoTextData.data_iter-style epoch
        iteration (SURVEY.md §2). The TPU training path instead stages
        all batches once in a device-resident BucketedPool and shuffles
        an index vector per epoch; this host-side iterator is the
        reference-shaped convenience surface."""
        batches = self.create_data_batch(batch_size, buckets)
        if shuffle:
            order = np.random.RandomState(seed).permutation(len(batches))
        else:
            order = np.arange(len(batches))
        for i in order:
            yield batches[int(i)]

    def data_sample(self, nsample: int, batches: Optional[List[TextBatch]] = None,
                    rng: Optional[np.random.RandomState] = None) -> TextBatch:
        """A random batch — parity with <ref>data/ §MonoTextData.data_sample,
        used by the host-mode aggressive inner loop."""
        rng = rng or np.random
        if batches:
            return batches[int(rng.randint(len(batches)))]
        idx = rng.randint(len(self.data), size=nsample)
        sents = [self.data[i] for i in idx]
        blen = _bucket_for(max(len(s) for s in sents), DEFAULT_BUCKETS)
        return self._pad_batch(sents, blen, nsample)
