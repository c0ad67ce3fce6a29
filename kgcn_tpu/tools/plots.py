"""Training plots: loss/accuracy curves, ROC-AUC, R2 scatter
(reference: kgcn/make_plots.py:15-179)."""
from __future__ import annotations

import os

import numpy as np


def _ensure_dir(config):
    path = config.get("plot_path", "./result/")
    os.makedirs(path, exist_ok=True)
    return path


def plot_cost(config, history, name: str = "") -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = _ensure_dir(config)
    epochs = [h["epoch"] for h in history]
    fig, ax = plt.subplots()
    ax.plot(epochs, [h["training_cost"] for h in history], label="train cost")
    if any("validation_cost" in h for h in history):
        ax.plot(
            epochs,
            [h.get("validation_cost", np.nan) for h in history],
            label="valid cost",
        )
    ax.set_xlabel("epoch")
    ax.set_ylabel("cost")
    ax.legend()
    out = os.path.join(path, f"cost{name}.png")
    fig.savefig(out)
    plt.close(fig)
    print(f"[SAVE] {out}")
    return out


def plot_auc(config, labels, prediction, name: str = "",
             mask_label=None) -> str:
    """Micro/macro ROC curves (reference: kgcn/make_plots.py:70-134).
    ``mask_label`` excludes unmeasured (masked, NaN→0-filled) multitask
    cells — scoring them as negatives would bias every per-task curve."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import auc, roc_curve

    path = _ensure_dir(config)
    labels = np.asarray(labels)
    pred = np.asarray(prediction)
    if pred.ndim == 3:
        pred = pred[..., 1]
    mask = None if mask_label is None else np.asarray(mask_label)
    fig, ax = plt.subplots()
    for c in range(labels.shape[1]):
        keep = (
            slice(None) if mask is None or mask.ndim < 2
            else mask[:, c] > 0
        )
        yl, yp = labels[keep, c], pred[keep, c]
        if len(np.unique(yl)) < 2:
            continue
        fpr, tpr, _ = roc_curve(yl, yp)
        ax.plot(fpr, tpr, label=f"class {c} (AUC={auc(fpr, tpr):.3f})")
    ax.plot([0, 1], [0, 1], "k--", lw=0.5)
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.legend()
    out = os.path.join(path, f"auc{name}.png")
    fig.savefig(out)
    plt.close(fig)
    print(f"[SAVE] {out}")
    return out


def plot_r2(config, labels, prediction, name: str = "") -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import r2_score

    path = _ensure_dir(config)
    labels = np.asarray(labels).ravel()
    pred = np.asarray(prediction).ravel()
    fig, ax = plt.subplots()
    ax.scatter(labels, pred, s=8, alpha=0.6)
    lo, hi = min(labels.min(), pred.min()), max(labels.max(), pred.max())
    ax.plot([lo, hi], [lo, hi], "k--", lw=0.5)
    ax.set_xlabel("label")
    ax.set_ylabel("prediction")
    ax.set_title(f"R2 = {r2_score(labels, pred):.4f}")
    out = os.path.join(path, f"r2{name}.png")
    fig.savefig(out)
    plt.close(fig)
    print(f"[SAVE] {out}")
    return out
