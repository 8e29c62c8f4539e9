"""Render one posterior-mean-space snapshot (paper Fig. 1-style scatter).

Parity: <ref>plot_scripts/plot_single*.py (SURVEY.md §2, conf MED) — a
scatter of (true model posterior mean ⟨z⟩_{p(z|x)}, inferred mean μ(x))
for the probe set at one training snapshot. Points on the diagonal mean
the inference network tracks the model posterior; points collapsed onto
the x-axis (μ ≈ 0) are posterior collapse.

Usage:
    python plot_scripts/plot_single.py plot_data/synthetic_aggr1_seed783435.pkl \
        [--epoch -1] [--out out.png]
"""
import argparse
import pickle

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pickle")
    p.add_argument("--epoch", type=int, default=None,
                   help="epoch to plot (default: last snapshot)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    with open(args.pickle, "rb") as fh:
        trace = pickle.load(fh)
    snap = trace[-1] if args.epoch is None else next(
        t for t in trace if t["epoch"] == args.epoch)
    pairs = snap["pairs"]

    fig, ax = plt.subplots(figsize=(5, 5))
    lim = max(1.0, abs(pairs).max() * 1.1)
    ax.plot([-lim, lim], [-lim, lim], "k--", lw=0.8, alpha=0.5)
    ax.axhline(0, color="gray", lw=0.5)
    ax.scatter(pairs[:, 0], pairs[:, 1], s=6, alpha=0.5)
    ax.set_xlabel(r"model posterior mean $\langle z\rangle_{p(z|x)}$")
    ax.set_ylabel(r"inferred mean $\mu(x)$")
    ax.set_title(f"epoch {snap['epoch']}")
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    out = args.out or args.pickle.replace(".pkl", f"_ep{snap['epoch']}.png")
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main()
