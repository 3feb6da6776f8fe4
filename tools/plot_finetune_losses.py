"""Plot the stylization finetune loss trajectory from a run's stats.p.

Produces a single light-surface PNG: the four style-loss terms
(clip / perceptual / contrastive / patchnce) plus the total, over
finetune iterations — the optimization-stability evidence for the
signature NeRF-Art path (reference volsdf.py:719-781; with random
CLIP/VGG weights in this zero-egress env it demonstrates stable
optimization, not style quality).

Usage:
    python tools/plot_finetune_losses.py --stats logs/vangogh_r3/stats.p \
        --out pretrained/vangogh_r3_losses.png
"""
import argparse
import pickle

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# categorical slots 1-4 (fixed order) + neutral ink for the sum
SERIES = [
    ("clip", "#2a78d6"),
    ("perceptual", "#eb6834"),
    ("contrastive", "#1baf7a"),
    ("patchnce", "#eda100"),
]
TOTAL_COLOR = "#3d3d3a"
GRID = "#e5e4df"
INK = "#1a1a19"
MUTED = "#6e6d66"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stats", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--key", type=str, default="losses")
    ap.add_argument("--x_offset", type=int, default=0,
                    help="add to every x (cumulative-iteration axis for "
                         "a resumed stage)")
    args = ap.parse_args()

    with open(args.stats, "rb") as f:
        stats = pickle.load(f)
    losses = stats[args.key]

    fig, ax = plt.subplots(figsize=(8.0, 4.5), dpi=150)
    fig.patch.set_facecolor("white")
    ax.set_facecolor("white")

    def xy(name):
        pts = losses[name]
        return [p[0] + args.x_offset for p in pts], [p[1] for p in pts]

    for name, color in SERIES:
        if name not in losses:
            continue
        x, y = xy(name)
        ax.plot(x, y, color=color, linewidth=2, label=name)
        ax.annotate(name, (x[-1], y[-1]), xytext=(6, 0),
                    textcoords="offset points", color=INK, fontsize=9,
                    va="center")
    if "total" in losses:
        x, y = xy("total")
        ax.plot(x, y, color=TOTAL_COLOR, linewidth=2, linestyle=(0, (4, 2)),
                label="total")
        ax.annotate("total", (x[-1], y[-1]), xytext=(6, 0),
                    textcoords="offset points", color=INK, fontsize=9,
                    va="center")

    ax.set_xlabel("finetune iteration", color=MUTED)
    ax.set_ylabel("loss", color=MUTED)
    ax.set_title("Stylization finetune loss trajectory "
                 "(seeded random CLIP/VGG towers)", color=INK, fontsize=11)
    ax.grid(True, color=GRID, linewidth=0.8)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=MUTED)
    ax.legend(loc="upper center", ncols=5, frameon=False,
              fontsize=9, labelcolor=INK)
    ax.margins(x=0.08)

    fig.tight_layout()
    fig.savefig(args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
