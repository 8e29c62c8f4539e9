"""Real-English docstring-harvest corpus (data/english.py).

Hermetic: the harvester runs against a fabricated package tree, not the
box's site-packages, so these tests are fast and environment-independent.
"""
import os

import pytest

from vae_lagging_encoder_tpu.data.english import (
    _prose_lines, _tokenize, ensure_english_dataset, generate_english_corpus)


PROSE = ("The quick brown fox jumps over the lazy dog near the river bank "
         "while seventeen other animals watch from a safe distance away. ")


def _make_tree(root, n_files=30, n_docs=6):
    """A fake installed-package tree: two packages, prose + junk docstrings."""
    for i in range(n_files):
        pkg = "alpha" if i % 2 else "beta"
        d = os.path.join(root, pkg, f"sub{i}")
        os.makedirs(d, exist_ok=True)
        body = ['"""' + PROSE * 3 + f" marker{i} \n"
                ">>> doctest_line(1)\n"
                ":param x: field list line\n"
                '"""\n']
        for j in range(n_docs):
            body.append(
                f"def f{j}():\n"
                f'    """{PROSE * 2} Section {j} covers version 2.5 of the '
                f'API.\n        indented_code = {j}\n    """\n')
        with open(os.path.join(d, "mod.py"), "w") as fh:
            fh.write("".join(body))


def test_prose_filter_and_tokenizer():
    doc = (">>> code()\n:param x: nope\nThis sentence is real prose "
           "with :class:`Foo.bar` and snake_case and 123 numbers.\nshort\n")
    lines = list(_prose_lines(doc))
    assert len(lines) == 1 and lines[0].startswith("This sentence")
    toks = _tokenize(lines[0])
    # lowercased, punctuation split, digits collapsed, markup stripped
    assert "this" in toks and "." in toks and "_num" in toks
    assert "snake" in toks and "case" in toks
    assert all(":" not in t or t == ":" for t in toks)
    assert "class" not in toks  # the :class: role is markup, not prose


def test_generate_deterministic_capped(tmp_path):
    _make_tree(str(tmp_path))
    kw = dict(num_sentences=40, vocab_keep=20, mean_len=60.0, std_len=10.0,
              seed=7, root=str(tmp_path))
    docs, labels = generate_english_corpus(**kw)
    docs2, labels2 = generate_english_corpus(**kw)
    assert docs == docs2 and labels == labels2
    assert len(docs) == 40
    lens = [len(d) for d in docs]
    assert 30 <= sum(lens) / len(lens) <= 90
    vocab = {t for d in docs for t in d}
    assert "_unk" in vocab and len(vocab) <= 21  # 20 kept + _unk
    assert set(labels) <= {0, 1, 2}  # two packages -> ranks 1,2 (no rest)


def test_generate_exhaustion_raises(tmp_path):
    _make_tree(str(tmp_path), n_files=2, n_docs=1)
    with pytest.raises(RuntimeError, match="exhausted"):
        generate_english_corpus(num_sentences=10_000, root=str(tmp_path))


def test_ensure_dataset_roundtrip(tmp_path):
    src = tmp_path / "site"
    _make_tree(str(src))
    root = str(tmp_path / "docs_english_data")
    paths = ensure_english_dataset(root=root, num_sentences=44,
                                   source_root=str(src))
    assert sorted(paths) == ["test", "train", "valid"]
    with open(paths["train"]) as fh:
        lines = fh.readlines()
    assert len(lines) == 40  # 44 - 2*(44//22)
    label, sent = lines[0].split("\t", 1)
    assert label.isdigit() and len(sent.split()) > 10
    # idempotent second call returns the same files untouched
    before = os.path.getmtime(paths["train"])
    assert ensure_english_dataset(root=root, num_sentences=44,
                                  source_root=str(src)) == paths
    assert os.path.getmtime(paths["train"]) == before
