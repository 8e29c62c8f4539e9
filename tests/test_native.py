"""Native C++ text pipeline vs the pure-Python oracle (exact parity)."""
import os
import time

import numpy as np
import pytest

from vae_lagging_encoder_tpu.data import MonoTextData, Vocab
from vae_lagging_encoder_tpu.data import native
from vae_lagging_encoder_tpu.data.synthetic import generate_synthetic_corpus


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    sents, topics = generate_synthetic_corpus(num_sentences=500, vocab_size=80,
                                              min_len=3, max_len=25, seed=9)
    path = tmp_path_factory.mktemp("corpus") / "train.txt"
    with open(path, "w") as fh:
        for t, s in zip(topics, sents):
            fh.write(f"{t}\t" + " ".join(s) + "\n")
    return str(path), sents, topics


def test_native_builds():
    assert native.available(), "g++ build of csrc/textproc.cpp failed"


def test_vocab_parity(corpus_file):
    path, sents, _ = corpus_file
    v_native = Vocab.from_file(path, label=True)
    v_python = Vocab.from_corpus(sents)
    assert v_native.word2id == v_python.word2id


def test_encode_parity(corpus_file):
    path, sents, topics = corpus_file
    d_native = MonoTextData(path, label=True)
    v = Vocab.from_corpus(sents)
    d_python = MonoTextData(sentences=sents, labels=topics, vocab=v)
    assert d_native.vocab.word2id == v.word2id
    assert len(d_native) == len(d_python)
    assert d_native.data == d_python.data
    assert d_native.labels == topics


def test_unk_mapping(corpus_file, tmp_path):
    path, sents, _ = corpus_file
    v = Vocab.from_file(path, label=True)
    other = tmp_path / "other.txt"
    with open(other, "w") as fh:
        fh.write("0\tw0 NEVERSEENWORD w1\n")
    d = MonoTextData(str(other), label=True, vocab=v)
    from vae_lagging_encoder_tpu.data.vocab import BOS_ID, EOS_ID, UNK_ID
    assert d.data[0] == [BOS_ID, v["w0"], UNK_ID, v["w1"], EOS_ID]


def test_no_label_mode(tmp_path):
    p = tmp_path / "plain.txt"
    with open(p, "w") as fh:
        fh.write("a b c\nb c d\n\n")  # incl. an empty line to skip
    d = MonoTextData(str(p))
    assert len(d) == 2
    v = d.vocab
    assert d.data[0][1:-1] == [v["a"], v["b"], v["c"]]


def test_fallback_matches_native_on_edge_lines(tmp_path, monkeypatch):
    """The pure-Python reader must be BIT-IDENTICAL to the native one on
    the lines where they historically diverged (code-review r3): labeled
    lines with an empty body (native drops them entirely), non-numeric
    labels (native strtol -> 0), no-tab lines (label -1), blank lines, and
    non-ASCII whitespace (native is_space is ASCII-only; bare str.split
    would also break on U+00A0)."""
    path = str(tmp_path / "edge.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("3\thello world\n")
        fh.write("7\t\n")                      # labeled, empty body: skip
        fh.write("7\t   \n")                   # labeled, ws-only body: skip
        fh.write("pos\tgreat movie\n")         # non-numeric label -> 0
        fh.write("\n")                         # blank: skip
        fh.write("no tab line\n")              # label -1
        fh.write("-2\tfoo bar baz\n")     # U+00A0 is NOT a separator
        fh.write("9\tlast one\n")

    d_native = MonoTextData(path, label=True)
    assert native.available()

    monkeypatch.setattr(native, "count_vocab", lambda *a, **k: None)
    monkeypatch.setattr(native, "encode_corpus", lambda *a, **k: None)
    d_python = MonoTextData(path, label=True)

    assert d_python.vocab.word2id == d_native.vocab.word2id
    assert d_python.data == d_native.data
    assert d_python.labels == d_native.labels == [3, 0, -1, -2, 9]
    assert "foo bar" in d_native.vocab.word2id  # one token, not two


def test_data_sample_returns_padded_batch(corpus_file):
    """<ref>data/ §MonoTextData.data_sample — random batch with the shared
    bucket set (previously untested and bucket-drifted, code-review r3)."""
    path, sents, _ = corpus_file
    d = MonoTextData(path, label=True)
    b = d.data_sample(8, rng=np.random.RandomState(0))
    assert b.tokens.shape[0] == 8 and b.row_weight.sum() == 8
    from vae_lagging_encoder_tpu.data.text import DEFAULT_BUCKETS
    assert b.tokens.shape[1] in DEFAULT_BUCKETS
