"""Evaluation metrics: exact AUC + log-loss.

Reference equivalent: sklearn ``roc_auc_score`` + log-loss over the test set
(SURVEY.md §2.1 "Eval", [P §5.1.2], [B:2]). Implemented from scratch
(rank-statistic AUC with average ranks for ties — identical to sklearn's
result) so the same estimator can also run device-side and psum-merged across
hosts (SURVEY.md §5.5).
"""

from __future__ import annotations

import numpy as np


def auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Exact ROC-AUC via the Mann-Whitney U statistic with tie-averaged
    ranks. scores: [N] real-valued; labels: [N] in {0, 1}."""
    scores = np.asarray(scores, np.float64).ravel()
    labels = np.asarray(labels).ravel() > 0.5
    n_pos = int(labels.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    sorted_scores = scores[order]
    # Average rank within tied groups (1-indexed ranks).
    ranks = np.empty(labels.size, np.float64)
    idx = np.arange(1, labels.size + 1, dtype=np.float64)
    # Vectorized tie handling: group boundaries where the score changes.
    boundaries = np.flatnonzero(np.diff(sorted_scores)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [labels.size]])
    avg = (idx[starts.astype(int)] + idx[ends.astype(int) - 1]) / 2.0
    group_of = np.repeat(np.arange(len(starts)), ends - starts)
    ranks[order] = avg[group_of]
    rank_sum_pos = ranks[labels].sum()
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def log_loss(scores_logits: np.ndarray, labels: np.ndarray) -> float:
    """Mean binary cross-entropy from logits."""
    x = np.asarray(scores_logits, np.float64).ravel()
    y = np.asarray(labels, np.float64).ravel()
    per = np.maximum(x, 0) - x * y + np.log1p(np.exp(-np.abs(x)))
    return float(per.mean())


def gauc(scores: np.ndarray, labels: np.ndarray,
         uids: np.ndarray) -> float:
    """Group AUC: impression-weighted mean of per-user AUCs, skipping
    users whose eval examples are single-class (no ranking defined).

    The CTR-serving ranking metric (candidates are ranked within one
    user's request, never across users): GAUC = sum_u w_u * AUC_u /
    sum_u w_u with w_u = the user's impression count. Returns nan when no
    user has both classes. Complements the global ``auc`` the paper
    reports ([P §5.1.2]).
    """
    scores = np.asarray(scores, np.float64).ravel()
    labels = np.asarray(labels).ravel()
    uids = np.asarray(uids).ravel()
    order = np.argsort(uids, kind="mergesort")
    u_sorted = uids[order]
    bounds = np.flatnonzero(np.diff(u_sorted)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(u_sorted)]])
    total_w = 0.0
    acc = 0.0
    for s, e in zip(starts, ends):
        grp = order[s:e]
        a = auc(scores[grp], labels[grp])
        if a == a:  # both classes present
            w = float(e - s)
            acc += w * a
            total_w += w
    return acc / total_w if total_w > 0 else float("nan")
