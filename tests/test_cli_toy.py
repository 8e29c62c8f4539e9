"""Toy-driver CLI test: the posterior-mean-space tracing entry point runs
end-to-end and dumps well-formed probe pickles (closing the last
CLI-surface coverage gap after text/image generation;
<ref>toy.py §main, SURVEY.md §3.5)."""
import os
import pickle

import numpy as np
import pytest

from vae_lagging_encoder_tpu.cli import toy as cli_toy
from vae_lagging_encoder_tpu.data.synthetic import generate_synthetic_corpus


def test_toy_cli_end_to_end(tmp_path):
    root = tmp_path / "d"
    root.mkdir()
    sents, _ = generate_synthetic_corpus(num_sentences=120, vocab_size=25,
                                         min_len=4, max_len=10, seed=5)
    for split, sl in {"train": slice(0, 80), "valid": slice(80, 100),
                      "test": slice(100, 120)}.items():
        with open(root / f"{split}.txt", "w") as fh:
            for s in sents[sl]:
                fh.write(" ".join(s) + "\n")
    plot_dir = str(tmp_path / "plots")
    rc = cli_toy.main([
        "--dataset", "synthetic",
        "--train_data", str(root / "train.txt"),
        "--val_data", str(root / "valid.txt"),
        "--test_data", str(root / "test.txt"),
        "--batch_size", "8", "--epochs", "2", "--plot_niter", "1",
        "--num_plot", "20", "--zmin", "-5", "--zmax", "5", "--dz", "0.5",
        "--plot_dir", plot_dir])
    assert rc == 0
    path = os.path.join(plot_dir, "synthetic_aggr0_seed783435.pkl")
    assert os.path.isfile(path)
    with open(path, "rb") as fh:
        trace = pickle.load(fh)
    # record(-1) + one per epoch
    assert [t["epoch"] for t in trace] == [-1, 0, 1]
    for t in trace:
        pairs = t["pairs"]
        assert pairs.shape[1] == 2 and 0 < pairs.shape[0] <= 20
        assert np.isfinite(pairs).all()
        # posterior means live on the probe grid's support
        assert (np.abs(pairs[:, 0]) <= 5.0).all()


def test_toy_cli_rejects_multidim_latent():
    with pytest.raises(SystemExit):
        cli_toy.init_config(["--dataset", "yahoo"])
