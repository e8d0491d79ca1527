"""Held-out evaluation: AUC + log-loss over an eval split.

Reference equivalent: the ``evaluate`` loop computing AUC and log-loss on the
held-out set between training epochs (SURVEY.md §3.2, [P §5.1.2]).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import numpy as np

from ..data.loader import DataLoader
from . import metrics as M


def evaluate(eval_step: Callable, params, loader: DataLoader) -> Dict[str, float]:
    """eval_step(params, batch) -> logits [B]. Pads the final short batch and
    trims by n_valid, so every example is scored exactly once."""
    all_logits, all_labels = [], []
    for batch, n_valid in loader.one_epoch():
        logits = np.asarray(jax.device_get(eval_step(params, batch)))
        all_logits.append(logits[:n_valid])
        all_labels.append(np.asarray(batch.label)[:n_valid])
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    return {
        "auc": M.auc(logits, labels),
        "log_loss": M.log_loss(logits, labels),
        "n": float(len(labels)),
    }
