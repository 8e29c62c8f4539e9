"""Render the posterior-mean-space training progression (paper GIF grid).

Parity: <ref>plot_scripts/plot_multiple*.py (SURVEY.md §2, conf MED) — a
grid (or animated GIF with --gif) of posterior-mean-space scatters over
training epochs, the visualization of how aggressive training keeps μ(x)
tracking ⟨z⟩_{p(z|x)} while standard training collapses to the x-axis.

Usage:
    python plot_scripts/plot_multiple.py plot_data/synthetic_aggr1_seed783435.pkl
    python plot_scripts/plot_multiple.py ... --gif out.gif
"""
import argparse
import pickle

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pickle")
    p.add_argument("--compare", default=None,
                   help="second pickle rendered side-by-side (the paper's "
                        "plain-vs-aggressive collapse comparison)")
    p.add_argument("--labels", default="plain VAE,aggressive",
                   help="comma-separated panel labels for --compare")
    p.add_argument("--max_panels", type=int, default=12)
    p.add_argument("--gif", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    with open(args.pickle, "rb") as fh:
        trace = pickle.load(fh)
    traces = [trace]
    if args.compare:
        with open(args.compare, "rb") as fh:
            traces.append(pickle.load(fh))
    lim = max(1.0, max(abs(t["pairs"]).max()
                       for tr in traces for t in tr) * 1.05)

    def draw(ax, snap, label=None):
        ax.plot([-lim, lim], [-lim, lim], "k--", lw=0.6, alpha=0.4)
        ax.axhline(0, color="gray", lw=0.4)
        ax.scatter(snap["pairs"][:, 0], snap["pairs"][:, 1], s=4, alpha=0.5)
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        title = f"epoch {snap['epoch']}"
        if label:
            title = f"{label} — {title}"
        ax.set_title(title, fontsize=8)
        ax.tick_params(labelsize=6)

    labels = args.labels.split(",")
    if len(labels) < len(traces):  # pad so a short --labels never IndexErrors
        labels += [f"trace {i}" for i in range(len(labels), len(traces))]
    if args.gif:
        import matplotlib.animation as anim

        n = len(traces)
        frames = min(len(t) for t in traces)
        fig, axes = plt.subplots(1, n, figsize=(4 * n, 4), squeeze=False)

        def update(i):
            for r, tr in enumerate(traces):
                axes[0][r].clear()
                draw(axes[0][r], tr[i], labels[r] if n > 1 else None)

        a = anim.FuncAnimation(fig, update, frames=frames, interval=400)
        a.save(args.gif, writer="pillow", dpi=100)
        print(args.gif)
        return

    if args.compare:
        frames = min(len(t) for t in traces)
        step = max(1, frames // args.max_panels)
        idx = list(range(0, frames, step))[: args.max_panels]
        fig, axes = plt.subplots(len(traces), len(idx),
                                 figsize=(2.6 * len(idx), 2.8 * len(traces)),
                                 squeeze=False)
        for r, tr in enumerate(traces):
            for k, i in enumerate(idx):
                draw(axes[r][k], tr[i],
                     labels[r] if k == 0 else None)
        out = args.out or args.pickle.replace(".pkl", "_compare.png")
        fig.savefig(out, dpi=130, bbox_inches="tight")
        print(out)
        return

    step = max(1, len(trace) // args.max_panels)
    snaps = trace[::step][: args.max_panels]
    cols = min(4, len(snaps))
    rows = -(-len(snaps) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for k, snap in enumerate(snaps):
        draw(axes[k // cols][k % cols], snap)
    for k in range(len(snaps), rows * cols):
        axes[k // cols][k % cols].axis("off")
    out = args.out or args.pickle.replace(".pkl", "_grid.png")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print(out)


if __name__ == "__main__":
    main()
