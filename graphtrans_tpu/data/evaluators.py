"""Host-side metric evaluators (numpy/sklearn) replacing the OGB Evaluator
dependency (/root/reference/main.py:13,128-131):
  - code2: per-sample set-based subtoken precision/recall/F1, averaged
    (ogb.graphproppred.Evaluator('ogbg-code2') semantics).
  - molpcba: average precision per task over labeled entries, averaged over
    tasks that have at least one positive and one negative label.
  - molhiv: ROC-AUC with the same task-validity rule.
  - TU: plain accuracy.
"""

from __future__ import annotations

import numpy as np


def eval_f1_seq(seq_ref: list, seq_pred: list) -> dict:
    precisions, recalls, f1s = [], [], []
    for ref, pred in zip(seq_ref, seq_pred):
        label = set(ref)
        prediction = set(pred)
        tp = len(label & prediction)
        p = tp / len(prediction) if prediction else 0.0
        r = tp / len(label) if label else 0.0
        f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
        precisions.append(p)
        recalls.append(r)
        f1s.append(f1)
    return {
        "precision": float(np.mean(precisions)) if precisions else 0.0,
        "recall": float(np.mean(recalls)) if recalls else 0.0,
        "F1": float(np.mean(f1s)) if f1s else 0.0,
    }


def _valid_task_cols(y_true):
    """Tasks with >=1 positive and >=1 negative among labeled entries."""
    cols = []
    for t in range(y_true.shape[1]):
        labeled = y_true[:, t] == y_true[:, t]
        if labeled.any():
            vals = y_true[labeled, t]
            if (vals == 1).any() and (vals == 0).any():
                cols.append(t)
    return cols


def eval_ap(y_true: np.ndarray, y_pred: np.ndarray) -> dict:
    from sklearn.metrics import average_precision_score

    ap_list = []
    for t in _valid_task_cols(y_true):
        labeled = y_true[:, t] == y_true[:, t]
        ap_list.append(average_precision_score(y_true[labeled, t], y_pred[labeled, t]))
    return {"ap": float(np.mean(ap_list)) if ap_list else 0.0}


def eval_rocauc(y_true: np.ndarray, y_pred: np.ndarray) -> dict:
    from sklearn.metrics import roc_auc_score

    auc_list = []
    for t in _valid_task_cols(y_true):
        labeled = y_true[:, t] == y_true[:, t]
        auc_list.append(roc_auc_score(y_true[labeled, t], y_pred[labeled, t]))
    return {"rocauc": float(np.mean(auc_list)) if auc_list else 0.0}


def eval_acc(y_true: np.ndarray, y_pred: np.ndarray) -> dict:
    return {"acc": float((y_true == y_pred).mean()) if len(y_true) else 0.0}
