"""Per-task ROC-AUC from a CV info json (reference OR ours).

Usage: python refrun/compute_mt_auc.py refrun/artifacts/ref_mt_info_cv.json
The reference's multitask model emits one sigmoid per task
([N, tasks, 1] prediction_data); ours emits [N, tasks, 2] softmax pairs —
both handled.
"""
import json
import sys

import numpy as np
from sklearn.metrics import roc_auc_score


def _task_auc(y, p, m):
    """AUC over the OBSERVED cells only (multitask NaN→mask convention);
    NaN when a fold/task has a single observed class."""
    if m is not None:
        keep = m > 0
        y, p = y[keep], p[keep]
    if len(np.unique(y)) < 2:
        return np.nan
    return roc_auc_score(y, p)


def main(path):
    d = json.load(open(path))
    folds = d if isinstance(d, list) else d.get("folds", [])
    aucs = []
    for fold in folds:
        p = np.array(fold["prediction_data"], dtype=np.float64)
        y = np.array(fold["test_labels"], dtype=np.float64)
        # explicit None checks: `or` would treat a present-but-empty mask
        # as missing and silently score every cell
        m = fold.get("test_mask")
        if m is None:
            m = fold.get("test_mask_label")
        m = np.array(m, dtype=np.float64) if m is not None else None
        if p.ndim == 3 and p.shape[2] == 2:
            p = p[:, :, 1]
        elif p.ndim == 3:
            p = p[:, :, 0]
        aucs.append([
            _task_auc(y[:, t], p[:, t], m[:, t] if m is not None else None)
            for t in range(p.shape[1])
        ])
    a = np.array(aucs)
    print(f"per-task AUC (mean over folds): "
          f"{np.nanmean(a, axis=0).round(3).tolist()}")
    print(f"overall mean AUC: {np.nanmean(a):.3f}")


if __name__ == "__main__":
    main(sys.argv[1])
