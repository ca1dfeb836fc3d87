"""Render the trained-demo evidence curves to artifacts/*.png.

Sources:
  * runs/demo_r3_gvp40kp_*/: full-resolution metric pickles (train l2,
    held-out l2, in-training ModelAnalyzer molecule metrics).
  * runs/demo_egnn40kp_*/: the pickles only cover post-resume epochs (the
    metrics-survive-resume fix landed mid-run), so the analyzer points
    recorded in BASELINE.md ("Trained-model demonstration" table) are the
    source for the full trajectory.

Design: change-over-time -> line charts; one axis per panel (loss panels
log-y; 0-1 quality metrics on their own panel; atom-type KL separate —
different scale); categorical hues in fixed slot order with direct labels
at line ends; thin marks, recessive grid, text in ink colors.

Usage: python benchmarks/plot_demo_curves.py [--out artifacts]
"""
import argparse
import glob
import os
import pickle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

# validated reference palette (dataviz default, light mode, fixed slot order)
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
S1, S2, S3, S4 = "#2a78d6", "#eb6834", "#1baf7a", "#eda100"
GRID = "#e6e5e1"

plt.rcParams.update({
    "figure.facecolor": SURFACE, "axes.facecolor": SURFACE,
    "text.color": INK, "axes.labelcolor": INK2,
    "xtick.color": INK2, "ytick.color": INK2,
    "axes.edgecolor": GRID, "axes.grid": True, "grid.color": GRID,
    "grid.linewidth": 0.6, "axes.axisbelow": True,
    "font.size": 9, "axes.titlesize": 10, "axes.titleweight": "bold",
    "legend.frameon": False, "axes.spines.top": False, "axes.spines.right": False,
})


def _label_end(ax, x, y, text, color, dy=0.0):
    ax.annotate(text, (x[-1], y[-1]), xytext=(4, dy), textcoords="offset points",
                color=color, fontsize=8.5, fontweight="bold", va="center")


def _quality_panels(ax_q, ax_kl, ep, conn, frag, uniq, kl, marker=None, ms=4.5):
    kw = dict(lw=2, marker=marker, ms=ms)
    ax_q.plot(ep, conn, color=S1, **kw)
    ax_q.plot(ep, frag, color=S2, **kw)
    ax_q.plot(ep, uniq, color=S3, **kw)
    _label_end(ax_q, ep, conn, "connectivity", S1, 5)
    _label_end(ax_q, ep, frag, "frag frac", S2, -5)
    _label_end(ax_q, ep, uniq, "uniqueness", S3, 7)
    ax_q.set_ylim(-0.03, 1.06)
    ax_q.set_xlabel("epoch")
    ax_q.set_title("molecule quality (ModelAnalyzer, 0-1)")
    ax_q.legend(["connectivity", "largest-fragment fraction", "uniqueness"],
                loc="lower right", fontsize=8)

    ax_kl.plot(ep, np.maximum(kl, 1e-4), color=S4, lw=2, marker=marker, ms=ms)
    ax_kl.set_yscale("log")
    ax_kl.set_xlabel("epoch")
    ax_kl.set_title("atom-type KL vs training dist (log)")
    _label_end(ax_kl, ep, np.maximum(kl, 1e-4), "KL", S4)


def plot_run(run_dir, out_png, label):
    """Any demo run with full-resolution metric pickles."""
    try:
        train = pickle.load(open(os.path.join(run_dir, "train_metrics.pkl"), "rb"))
        test = pickle.load(open(os.path.join(run_dir, "test_metrics.pkl"), "rb"))
    except FileNotFoundError as e:
        print(f"skip {run_dir}: {e}")
        return
    tr_ep = np.array([r["epoch"] for r in train])
    tr_l2 = np.array([r["l2"] for r in train])
    te = [(r["epoch"], r["test_l2"]) for r in test if "test_l2" in r]
    mol = [(r["mol_epoch"], r) for r in test if "mol_connectivity" in r]
    if len(tr_l2) < 2 or not mol:
        print(f"skip {run_dir}: incomplete metric pickles "
              f"({len(tr_l2)} train rows, {len(mol)} analyzer rows)")
        return

    fig, axes = plt.subplots(1, 3, figsize=(11.5, 3.2), dpi=160)
    fig.subplots_adjust(left=0.06, right=0.985, bottom=0.16, top=0.86, wspace=0.28)

    ax = axes[0]
    ax.plot(tr_ep, tr_l2, color=S1, lw=1.2, alpha=0.45)
    k = max(len(tr_l2) // 80, 1)  # light smoothing for the headline trace
    sm = np.convolve(tr_l2, np.ones(k) / k, mode="valid")
    ax.plot(tr_ep[k - 1:], sm, color=S1, lw=2)
    if te:
        ax.plot(*zip(*te), color=S2, lw=0, marker="o", ms=4.5)
        _label_end(ax, [e for e, _ in te], [v for _, v in te], "held-out", S2, -6)
    _label_end(ax, tr_ep[k - 1:], sm, "train", S1, 6)
    ax.set_yscale("log")
    ax.set_xlabel("epoch")
    ax.set_title("denoising loss l2 (log)")
    ax.legend(["train (per interval)", "train (smoothed)", "held-out"],
              loc="upper right", fontsize=8)

    ep = np.array([e for e, _ in mol])
    _quality_panels(axes[1], axes[2], ep,
                    np.array([r["mol_connectivity"] for _, r in mol]),
                    np.array([r["mol_avg_frag_frac"] for _, r in mol]),
                    np.array([r["mol_uniqueness"] for _, r in mol]),
                    np.array([r["mol_atom_type_kl"] for _, r in mol]))
    fig.suptitle(f"{label} trained demo on molgen synthetic data "
                 f"({os.path.basename(run_dir)})", x=0.06, ha="left", fontsize=10)
    fig.savefig(out_png, facecolor=SURFACE)
    print("wrote", out_png)


# BASELINE.md "Trained-model demonstration" table (the pickles only cover
# post-resume epochs for this run)
EGNN_TABLE = dict(
    epoch=[0, 50, 90, 140, 160, 185],
    test_l2=[1.04, 0.254, 0.175, 0.162, 0.161, 0.158],
    connectivity=[0.0, 0.663, 0.813, 0.850, 0.775, 0.763],
    frag_frac=[0.056, 0.603, 0.664, 0.703, 0.656, 0.700],
    uniqueness=[0.31, 1.0, 1.0, 1.0, 1.0, 1.0],
    kl=[2.881, 0.0170, 0.0038, 0.0015, 0.0036, 0.0048],
)


def plot_egnn(out_png):
    t = EGNN_TABLE
    ep = np.array(t["epoch"], float)
    fig, axes = plt.subplots(1, 3, figsize=(11.5, 3.2), dpi=160)
    fig.subplots_adjust(left=0.06, right=0.985, bottom=0.16, top=0.86, wspace=0.28)

    ax = axes[0]
    ax.plot(ep, t["test_l2"], color=S2, lw=2, marker="o", ms=4.5)
    _label_end(ax, ep, t["test_l2"], "held-out", S2)
    ax.set_yscale("log")
    ax.set_xlabel("epoch")
    ax.set_title("held-out l2 (log)")

    _quality_panels(axes[1], axes[2], ep, np.array(t["connectivity"]),
                    np.array(t["frag_frac"]), np.array(t["uniqueness"]),
                    np.array(t["kl"]), marker="o")
    fig.suptitle("egnn_40kp trained demo — 185 epochs on molgen synthetic data "
                 "(BASELINE.md analyzer checkpoints)", x=0.06, ha="left", fontsize=10)
    fig.savefig(out_png, facecolor=SURFACE)
    print("wrote", out_png)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for pat, label, png in [
        ("demo_r3_gvp40kp_*", "gvp_40kp (160 epochs)", "demo_gvp40kp_curves.png"),
        ("demo_r3_egnnca_*", "egnn_ca (ca_only fixed encoder)", "demo_egnnca_curves.png"),
        ("egnn_all_atom_20260820_011840_*", "egnn_all_atom (fixed encoder, to ep 120)", "demo_egnnallatom_curves.png"),
        ("gvp_all_atom_20260821_*", "gvp_all_atom (fixed encoder, 20-epoch bounded demo)", "demo_gvpallatom_curves.png"),
        ("egnn_20kp_20260821_*", "egnn_20kp (learned 20-keypoint encoder)", "demo_egnn20kp_curves.png"),
        ("gvp_20kp_20260821_*", "gvp_20kp (learned 20-keypoint encoder)", "demo_gvp20kp_curves.png"),
        ("demo_r3_gvpca_*", "gvp_ca (ca_only fixed encoder)", "demo_gvpca_curves.png"),
    ]:
        runs = sorted(glob.glob(os.path.join(REPO, "runs", pat)))
        if runs:
            plot_run(runs[-1], os.path.join(args.out, png), label)
        else:
            print(f"no runs/{pat} run dir — figure skipped")
    plot_egnn(os.path.join(args.out, "demo_egnn40kp_curves.png"))


if __name__ == "__main__":
    main()
