"""Synthetic text corpus generation.

The reference ships a pre-generated ``datasets/synthetic_data`` (fetched by
<ref>prepare_data.py) used by the toy 1-D-latent posterior-mean-space
experiment (<ref>toy.py). With no network in this environment we generate an
equivalent corpus locally: sentences sampled from a small order-1 Markov
language model with two latent "topics", which gives the toy VAE real
structure to capture in its 1-D latent (same role as the reference's
LSTM-LM-generated synthetic data; SURVEY.md §3.5).
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


def generate_synthetic_corpus(
    num_sentences: int = 16000,
    vocab_size: int = 200,
    min_len: int = 5,
    max_len: int = 30,
    num_topics: int = 2,
    seed: int = 783435,
) -> Tuple[List[List[str]], List[int]]:
    """Sample sentences from per-topic Markov chains over a shared vocab."""
    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(vocab_size)]
    # Per-topic sparse-ish transition matrices with distinct stationary mass.
    trans = []
    for _ in range(num_topics):
        logits = rng.gumbel(size=(vocab_size, vocab_size)) * 2.0
        probs = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs /= probs.sum(axis=1, keepdims=True)
        trans.append(probs)
    start = rng.dirichlet(np.ones(vocab_size) * 0.3, size=num_topics)

    sentences, topics = [], []
    for _ in range(num_sentences):
        t = int(rng.randint(num_topics))
        length = int(rng.randint(min_len, max_len + 1))
        w = int(rng.choice(vocab_size, p=start[t]))
        sent = [w]
        for _ in range(length - 1):
            w = int(rng.choice(vocab_size, p=trans[t][w]))
            sent.append(w)
        sentences.append([words[i] for i in sent])
        topics.append(t)
    return sentences, topics


def ensure_synthetic_dataset(root: str = "datasets/synthetic_data",
                             seed: int = 783435) -> dict:
    """Write {train,valid,test}.txt under ``root`` if absent; return paths."""
    paths = {split: os.path.join(root, f"synthetic.{split}.txt")
             for split in ("train", "valid", "test")}
    if all(os.path.isfile(p) for p in paths.values()):
        return paths
    os.makedirs(root, exist_ok=True)
    sents, topics = generate_synthetic_corpus(seed=seed)
    splits = {"train": slice(0, 14000), "valid": slice(14000, 15000),
              "test": slice(15000, 16000)}
    for split, sl in splits.items():
        with open(paths[split], "w") as fh:
            for topic, sent in zip(topics[sl], sents[sl]):
                fh.write(f"{topic}\t" + " ".join(sent) + "\n")
    return paths
