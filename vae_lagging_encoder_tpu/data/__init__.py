from .vocab import Vocab
from .text import MonoTextData, TextBatch
from .synthetic import generate_synthetic_corpus, ensure_synthetic_dataset
from .omniglot import load_omniglot, ensure_omniglot_dataset
from .pool import BucketedPool, ImagePool, Pool

__all__ = [
    "Vocab",
    "MonoTextData",
    "TextBatch",
    "generate_synthetic_corpus",
    "ensure_synthetic_dataset",
    "load_omniglot",
    "ensure_omniglot_dataset",
    "BucketedPool",
    "ImagePool",
    "Pool",
]
