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
    p.add_argument("--max_panels", type=int, default=12)
    p.add_argument("--gif", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    with open(args.pickle, "rb") as fh:
        trace = pickle.load(fh)
    lim = max(1.0, max(abs(t["pairs"]).max() for t in trace) * 1.05)

    def draw(ax, snap):
        ax.plot([-lim, lim], [-lim, lim], "k--", lw=0.6, alpha=0.4)
        ax.axhline(0, color="gray", lw=0.4)
        ax.scatter(snap["pairs"][:, 0], snap["pairs"][:, 1], s=4, alpha=0.5)
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_title(f"epoch {snap['epoch']}", fontsize=8)
        ax.tick_params(labelsize=6)

    if args.gif:
        import matplotlib.animation as anim

        fig, ax = plt.subplots(figsize=(4, 4))

        def update(i):
            ax.clear()
            draw(ax, trace[i])

        a = anim.FuncAnimation(fig, update, frames=len(trace), interval=400)
        a.save(args.gif, writer="pillow", dpi=100)
        print(args.gif)
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
