"""Render the flagship-scale aggressive-vs-plain KL contrast figure.

Reads the two study runs' metric streams
(models/yahoo/r3_flagship_{aggr,plain}/log.metrics.jsonl, produced by
``experiments/flagship_study.sh``) and plots validation KL per epoch —
the posterior-collapse signature at Yahoo dims (the flagship-scale
companion of the toy posterior-mean-space figures; paper Fig. semantics,
arXiv:1901.05534).

Usage (repo root):
    python plot_scripts/plot_flagship_contrast.py \
        [--out plot_data/flagship_kl_contrast.png]
"""
from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# Two-series categorical palette (validated reference instance, slots 1-2
# in fixed order): blue = aggressive, orange = plain.
C_AGGR = "#2a78d6"
C_PLAIN = "#eb6834"
INK = "#333333"
INK_MUTED = "#767676"


def load_kl(path):
    epochs, kls = [], []
    with open(path) as fh:
        for line in fh:
            rec = json.loads(line)
            if "val_kl" in rec:
                epochs.append(int(rec["epoch"]))
                kls.append(float(rec["val_kl"]))
    return epochs, kls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--aggr", default="models/yahoo/r3_flagship_aggr/log.metrics.jsonl")
    ap.add_argument("--plain", default="models/yahoo/r3_flagship_plain/log.metrics.jsonl")
    ap.add_argument("--out", default="plot_data/flagship_kl_contrast.png")
    ap.add_argument("--title", default="Posterior collapse at flagship "
                    "scale (Yahoo dims, offline corpus)")
    args = ap.parse_args()

    ea, ka = load_kl(args.aggr)
    ep, kp = load_kl(args.plain)
    if not ka or not kp:
        raise SystemExit(
            f"no val_kl epochs logged yet (aggr: {len(ka)}, plain: "
            f"{len(kp)}) — did the study finish at least one epoch?")

    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    ax.plot(ea, ka, color=C_AGGR, lw=2, solid_capstyle="round",
            label="aggressive")
    ax.plot(ep, kp, color=C_PLAIN, lw=2, ls="--", solid_capstyle="round",
            label="plain VAE")
    # selective direct labels at the series' final points (identity never
    # color-alone; text wears ink, not series color)
    ax.annotate(f"aggressive · KL {ka[-1]:.2f}", (ea[-1], ka[-1]),
                xytext=(6, 4), textcoords="offset points", color=INK,
                fontsize=9)
    ax.annotate(f"plain · KL {kp[-1]:.2f}", (ep[-1], kp[-1]),
                xytext=(6, 4), textcoords="offset points", color=INK,
                fontsize=9)
    ax.set_xlabel("epoch", color=INK)
    ax.set_ylabel("validation KL (nats)", color=INK)
    ax.set_title(args.title, color=INK, fontsize=11)
    ax.grid(True, color="#e6e6e6", lw=0.8)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK_MUTED)
    ax.tick_params(colors=INK_MUTED)
    ax.legend(frameon=False, loc="upper right", fontsize=9)
    ax.set_ylim(bottom=0)
    ax.margins(x=0.02)
    fig.tight_layout()
    if os.path.dirname(args.out):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
