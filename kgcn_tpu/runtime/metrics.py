"""Metric-dict protocol + aggregation + offline sklearn battery.

Models emit per-batch metric dicts (``correct_count``, ``count``,
``each_correct_count``, ``each_count``, ``error_sum`` — the reference
protocol, kgcn/core.py:168-209, producers e.g. example_model/model.py:63-69).
``aggregate_metrics`` sums them across batches and derives
accuracy / mse / gmfe / each_accuracy exactly as ``CoreModel.evaluation``.

``compute_metrics`` is the offline sklearn battery (reference:
gcn.py:170-256): ROC-AUC, average precision, accuracy, balanced accuracy,
MCC, Jaccard, precision/recall/F1 for classification; R2/MSE/gmfe for
regression — with the same binary / multiclass / multitask shape handling.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def aggregate_metrics(
    batch_metrics: List[Dict[str, np.ndarray]],
    num: int,
    task: str = "multitask_classification",
    key_prefix: str = "",
) -> Optional[Dict[str, np.ndarray]]:
    """Sum per-batch metric dicts, then derive task metrics
    (reference: kgcn/core.py:168-209)."""
    if not batch_metrics:
        return None
    summed: Dict[str, np.ndarray] = {}
    for m in batch_metrics:
        for k, v in m.items():
            v = np.asarray(v)
            summed[k] = v if k not in summed else summed[k] + v
    out = {key_prefix + k: v for k, v in summed.items()}

    def _ratio(a, b):
        return summed[a] / summed[b] if b in summed else summed[a] / num

    if task == "regression":
        if "error_sum" in summed:
            out[key_prefix + "mse"] = _ratio("error_sum", "count")
    elif task == "regression_gmfe":
        if "error_sum" in summed:
            out[key_prefix + "gmfe"] = np.exp(_ratio("error_sum", "count"))
    else:
        if "correct_count" in summed:
            out[key_prefix + "accuracy"] = _ratio("correct_count", "count")
        if "each_correct_count" in summed:
            out[key_prefix + "each_accuracy"] = _ratio(
                "each_correct_count", "each_count"
            )
        if key_prefix + "accuracy" not in out and key_prefix + "each_accuracy" in out:
            out[key_prefix + "accuracy"] = np.nanmean(
                out[key_prefix + "each_accuracy"]
            )
    return out


def compute_metrics(config, labels, pred_data, mask_label=None):
    """Offline sklearn metric battery (reference: gcn.py:170-256).

    Shapes: labels [N, L] one-hot or multitask binary; pred_data [N, classes]
    or [N, tasks, 2] (multitask).  Returns a JSON-serialisable dict.
    """
    from sklearn import metrics as skm

    task = config.get("task", "multitask_classification")
    result = {}
    labels = np.asarray(labels)
    pred_data = np.asarray(pred_data)

    if task in ("regression", "regression_gmfe"):
        result["r2"] = float(skm.r2_score(labels, pred_data))
        result["mse"] = float(skm.mean_squared_error(labels, pred_data))
        ratio = np.clip(np.abs(pred_data) + 1e-12, 1e-12, None) / np.clip(
            np.abs(labels) + 1e-12, 1e-12, None
        )
        result["gmfe"] = float(np.exp(np.mean(np.abs(np.log(ratio)))))
        return result

    if pred_data.ndim == 3:  # multitask: [N, tasks, 2]
        ntasks = pred_data.shape[1]
        per_task = []
        for t in range(ntasks):
            m = (
                mask_label[:, t] > 0
                if mask_label is not None
                else np.ones(len(labels), bool)
            )
            if m.sum() == 0:
                per_task.append({})
                continue
            y = labels[m, t]
            p = pred_data[m, t, 1]
            per_task.append(_binary_metrics(y, p))
        result["each_task"] = per_task
        for key in ("auc", "acc", "ap"):
            vals = [d[key] for d in per_task if key in d]
            if vals:
                result[key] = float(np.nanmean(vals))
        return result

    if labels.ndim == 2 and labels.shape[1] == 2:  # binary one-hot
        y = np.argmax(labels, axis=1)
        p = pred_data[:, 1]
        result.update(_binary_metrics(y, p))
        return result

    # multiclass
    y = np.argmax(labels, axis=1) if labels.ndim == 2 else labels
    yhat = np.argmax(pred_data, axis=1)
    result["acc"] = float(skm.accuracy_score(y, yhat))
    result["balanced_acc"] = float(skm.balanced_accuracy_score(y, yhat))
    try:
        if labels.ndim == 2:
            result["auc_macro"] = float(
                skm.roc_auc_score(labels, pred_data, average="macro")
            )
            result["auc_micro"] = float(
                skm.roc_auc_score(labels, pred_data, average="micro")
            )
    except ValueError:
        pass
    result["f1_macro"] = float(skm.f1_score(y, yhat, average="macro"))
    return result


def _binary_metrics(y, p):
    from sklearn import metrics as skm

    yhat = (p > 0.5).astype(int)
    out = {
        "acc": float(skm.accuracy_score(y, yhat)),
        "balanced_acc": float(skm.balanced_accuracy_score(y, yhat)),
        "mcc": float(skm.matthews_corrcoef(y, yhat)),
        "jaccard": float(skm.jaccard_score(y, yhat, zero_division=0)),
        "precision": float(skm.precision_score(y, yhat, zero_division=0)),
        "recall": float(skm.recall_score(y, yhat, zero_division=0)),
        "f1": float(skm.f1_score(y, yhat, zero_division=0)),
    }
    if len(np.unique(y)) > 1:
        out["auc"] = float(skm.roc_auc_score(y, p))
        out["ap"] = float(skm.average_precision_score(y, p))
    return out
