"""Data-layer tests: vocab, bucketing/padding invariants, pools, omniglot."""
import numpy as np
import pytest

from vae_lagging_encoder_tpu.data import (
    BucketedPool, MonoTextData, Vocab, generate_synthetic_corpus,
)
from vae_lagging_encoder_tpu.data.omniglot import image_batches, load_omniglot
from vae_lagging_encoder_tpu.data.vocab import BOS_ID, EOS_ID, PAD_ID, UNK_ID


def make_corpus(n=200, seed=0):
    sents, _ = generate_synthetic_corpus(num_sentences=n, vocab_size=50,
                                         min_len=3, max_len=40, seed=seed)
    return sents


def test_vocab_specials_and_unk():
    v = Vocab.from_corpus([["a", "b", "a"], ["c"]])
    assert v["<pad>"] == PAD_ID and v["<unk>"] == UNK_ID
    assert v["<s>"] == BOS_ID and v["</s>"] == EOS_ID
    assert v["zzz-not-there"] == UNK_ID
    assert v.encode(["a"]) == [BOS_ID, v["a"], EOS_ID]
    assert len(v) == 4 + 3


def test_vocab_deterministic_and_reused():
    sents = make_corpus()
    v1 = Vocab.from_corpus(sents)
    v2 = Vocab.from_corpus(sents)
    assert v1.word2id == v2.word2id
    data = MonoTextData(sentences=sents, vocab=v1)
    assert data.vocab is v1


def test_batching_padding_invariants():
    sents = make_corpus()
    data = MonoTextData(sentences=sents)
    bs = 16
    batches = data.create_data_batch(bs, buckets=(8, 16, 32, 64))
    # every sentence appears exactly once
    assert sum(b.num_sentences for b in batches) == len(sents)
    total_words = sum(len(s) + 1 for s in sents)  # +<s>+</s> -1 predicted
    assert sum(b.num_words for b in batches) == total_words
    for b in batches:
        assert b.tokens.shape == (bs, b.seq_len)
        assert b.seq_len in (8, 16, 32, 64)
        # mask marks exactly the non-pad prefix; pad rows weight 0
        for r in range(bs):
            ln = int(b.mask[r].sum())
            if b.row_weight[r] == 0:
                assert ln == 0 and (b.tokens[r] == PAD_ID).all()
            else:
                assert b.tokens[r, 0] == BOS_ID
                assert b.tokens[r, ln - 1] == EOS_ID
                assert (b.tokens[r, ln:] == PAD_ID).all()
                assert (b.mask[r, :ln] == 1).all()


def test_bucket_overflow():
    sents = [["w"] * 100]  # length 102 with specials > max bucket 64
    data = MonoTextData(sentences=sents)
    (b,) = data.create_data_batch(4, buckets=(8, 16, 32, 64))
    assert b.seq_len == 112  # ceil(102/16)*16
    assert b.num_sentences == 1


def test_bucketed_pool_sampling():
    import jax

    sents = make_corpus()
    data = MonoTextData(sentences=sents)
    batches = data.create_data_batch(8, buckets=(8, 16, 32, 64))
    pool = BucketedPool(batches)
    assert pool.num_batches == len(batches)

    # In-graph sampling covers all buckets and stays in range.
    sample = jax.jit(pool.sample_coords)
    seen = set()
    for i in range(200):
        bucket, idx = sample(jax.random.PRNGKey(i))
        bucket, idx = int(bucket), int(idx)
        assert 0 <= bucket < pool.num_buckets
        assert 0 <= idx < int(pool.counts[bucket])
        seen.add(bucket)
    assert seen == set(range(pool.num_buckets))

    # switch() slices the batch the coords point at
    bucket, idx = pool.sample_coords(jax.random.PRNGKey(3))
    tok = pool.switch(bucket, idx, lambda t, m, w: t.sum())
    k, i = int(bucket), int(idx)
    assert int(tok) == int(np.asarray(pool.tokens[k][i]).sum())


def test_omniglot_synthetic_loader():
    train, val, test = load_omniglot(path="", allow_synthetic=True)
    for arr in (train, val, test):
        assert arr.ndim == 4 and arr.shape[1:] == (28, 28, 1)
        assert arr.dtype == np.float32
        assert 0.0 <= arr.min() and arr.max() <= 1.0
    stacked, w = image_batches(test, 64)
    assert stacked.shape[1:] == (64, 28, 28, 1)
    assert w.sum() == len(test)


def test_labels_parsed():
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write("1\thello world\n0\tfoo bar baz\n")
        path = fh.name
    try:
        d = MonoTextData(path, label=True)
        assert d.labels == [1, 0]
        assert len(d) == 2
    finally:
        os.unlink(path)


def test_flagship_corpus_generator():
    """The Yahoo/Yelp offline substitute: structured (topic-conditioned HMM)
    corpus at configurable scale with a per-sentence label prefix."""
    from vae_lagging_encoder_tpu.data.synthetic import (
        ensure_flagship_dataset, generate_flagship_corpus)

    sents, topics = generate_flagship_corpus(
        num_sentences=40, vocab_size=300, num_states=4, num_topics=3,
        mean_len=30, std_len=8, seed=5)
    assert len(sents) == len(topics) == 40
    assert all(0 <= t < 3 for t in topics)
    lens = [len(s) for s in sents]
    assert min(lens) >= 8 and 20 <= np.mean(lens) <= 40
    # deterministic for a fixed seed
    sents2, topics2 = generate_flagship_corpus(
        num_sentences=40, vocab_size=300, num_states=4, num_topics=3,
        mean_len=30, std_len=8, seed=5)
    assert sents == sents2 and topics == topics2

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        paths = ensure_flagship_dataset("yahoo", root=d, num_sentences=44)
        data = MonoTextData(paths["train"], label=True)
        assert len(data) == 40 and len(data.labels) == 40  # 44 - 2*2 eval


def test_data_iter_epoch_surface():
    """<ref>data/ §MonoTextData.data_iter — one epoch of shuffled batches
    (SURVEY.md §2 API surface; the TPU path uses BucketedPool instead)."""
    from vae_lagging_encoder_tpu.data.synthetic import generate_synthetic_corpus

    sents, _ = generate_synthetic_corpus(num_sentences=70, vocab_size=20,
                                         min_len=4, max_len=12, seed=3)
    d = MonoTextData(sentences=sents)
    epoch = list(d.data_iter(16, seed=0))
    assert sum(b.num_sentences for b in epoch) == 70
    # deterministic for a fixed seed, different order for another
    assert [b.tokens.shape for b in epoch] == \
           [b.tokens.shape for b in d.data_iter(16, seed=0)]
    flat = lambda ep: np.concatenate([b.tokens.ravel() for b in ep])
    assert not np.array_equal(flat(epoch), flat(d.data_iter(16, seed=1))) \
        or len(epoch) == 1
