"""Visual-inspection artifacts (reference tools/plot.py).

Spectrogram heatmaps and loss curves, written as PNGs into the experiment
directory with the same file naming as the reference (Mixture.png,
Masked_Mixture.png, Chosen_Permutation.png, Loss_NNN-MMM.png, ...).
matplotlib with the Agg backend; import stays lazy so headless compute jobs
without matplotlib never pay for it.
"""

from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_spec(array: np.ndarray, path: str) -> None:
    """Spectrogram heatmap of a (time, freq) array (reference plot.py:15-34)."""
    plt = _plt()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    plt.imshow(np.flipud(np.asarray(array).T))
    plt.tick_params(which="both", bottom=False, left=False,
                    labelbottom=False, labelleft=False)
    plt.colorbar(aspect=40, pad=0.025).ax.tick_params(labelsize="small")
    plt.xlabel("time")
    plt.ylabel("frequency")
    plt.title(os.path.basename(path).split(".")[0].replace("_", " "))
    plt.savefig(path, dpi=150, bbox_inches="tight")
    plt.clf()
    plt.cla()


def plot_loss(train_curve, cv_curve, path: str) -> None:
    """Loss curves: each curve is ([epochs], [losses]) (reference plot.py:38-73)."""
    plt = _plt()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    labels = ["train"]
    plt.plot(train_curve[0], train_curve[1])
    if cv_curve and len(cv_curve[0]):
        plt.plot(cv_curve[0], cv_curve[1])
        labels.append("cv")
    plt.legend(labels)
    plt.title(os.path.basename(path).split(".")[0].replace("_", " "))
    plt.xlabel("epoch")
    plt.ylabel("avg sample loss")
    plt.tick_params(labelsize="x-small", direction="in")
    plt.savefig(path, dpi=150, bbox_inches="tight")
    plt.clf()
    plt.cla()
