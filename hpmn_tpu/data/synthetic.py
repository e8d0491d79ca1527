"""Synthetic dataset generators.

Real Amazon/Taobao/XLong raw data is not downloadable in this environment
(SURVEY.md §7: no network at build time), so these generators produce data
matching each dataset's *schema and statistics* — vocab sizes, sequence length
T, label balance — per [B:7-9], plus a planted-long-range-structure task on
which a lifelong-memory model (HPMN) should beat short-horizon sequential
models (GRU4Rec/DIEN), mirroring the paper's XLong contrast [P §5.2].

Two generators:

- :func:`make_ctr_dataset` — "next-behavior" CTR examples in the reference
  preprocessing style [P §5.1.1]: each user has a latent preference over
  categories; behaviors are drawn from it; the positive target is a real next
  behavior, the negative a random item. Learnable by any sequence model.

- :func:`make_periodic_dataset` — the planted task (SURVEY.md §4 item 3):
  each user's interest categories appear only in the *early* part of the
  history (with periodic recurrence); the last ``noise_window`` events are
  pure noise; the label is "target's category is in the user's early-history
  interest set". Predicting requires carrying information across the noise
  window — the long-range memory the HPMN hierarchy is built for [P §4.2].

All generators are pure numpy, deterministic in ``seed``, and return a dict
of arrays consumable by :func:`hpmn_tpu.data.schema.batch_from_numpy`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """Schema-level description of one dataset family [B:7-9]."""

    name: str
    seq_len: int  # T
    n_items: int  # item-id vocab (0 = pad)
    n_cats: int  # category-id vocab (0 = pad/unknown)
    n_users: int


# Vocab sizes are scaled-down stand-ins with the paper's T values [B:7-9].
AMAZON = DatasetSpec("amazon", seq_len=100, n_items=20000, n_cats=400, n_users=8000)
TAOBAO = DatasetSpec("taobao", seq_len=300, n_items=50000, n_cats=800, n_users=8000)
XLONG = DatasetSpec("xlong", seq_len=1000, n_items=50000, n_cats=800, n_users=4000)

SPECS = {s.name: s for s in (AMAZON, TAOBAO, XLONG)}


def _item_to_cat(items: np.ndarray, n_items: int, n_cats: int) -> np.ndarray:
    """Deterministic item→category map; id 0 (pad) maps to cat 0."""
    # A fixed affine hash spreads categories over the item range.
    cats = (items.astype(np.int64) * 2654435761 % (n_cats - 1) + 1).astype(
        np.int32)
    return np.where(items == 0, 0, cats)


def _sample_items_for_cats(rng, cats: np.ndarray,
                           n_items: int, n_cats: int) -> np.ndarray:
    """Sample item ids whose category equals ``cats``, rejection-free:
    items are grouped into per-category pools once (sort by the hash
    category, searchsorted boundaries) and uniform draws index each pool."""
    # Build (lazily cached) per-category pools.
    global _POOLS
    key = (n_items, n_cats)
    if key not in _POOLS:
        all_items = np.arange(1, n_items, dtype=np.int32)
        all_cats = _item_to_cat(all_items, n_items, n_cats)
        order = np.argsort(all_cats, kind="stable")
        sorted_items = all_items[order]
        sorted_cats = all_cats[order]
        starts = np.searchsorted(sorted_cats, np.arange(n_cats))
        ends = np.searchsorted(sorted_cats, np.arange(n_cats), side="right")
        _POOLS[key] = (sorted_items, starts, ends)
    sorted_items, starts, ends = _POOLS[key]
    lo, hi = starts[cats], ends[cats]
    # Categories with an empty pool fall back to a random item.
    empty = hi <= lo
    offs = (rng.random(cats.shape) * np.maximum(hi - lo, 1)).astype(np.int64)
    picked = sorted_items[np.minimum(lo + offs, len(sorted_items) - 1)]
    fallback = rng.integers(1, n_items, size=cats.shape).astype(np.int32)
    return np.where(empty, fallback, picked).astype(np.int32)


_POOLS: dict = {}


def _finalize(spec: DatasetSpec, rng, uid, item_seq, seq_mask, target_item,
              label) -> Dict[str, np.ndarray]:
    n = uid.shape[0]
    cat_seq = _item_to_cat(item_seq, spec.n_items, spec.n_cats)
    neg_item = rng.integers(1, spec.n_items, size=item_seq.shape).astype(np.int32)
    return dict(
        uid=uid.astype(np.int32),
        item_seq=item_seq.astype(np.int32),
        cat_seq=cat_seq.astype(np.int32),
        seq_mask=seq_mask.astype(np.float32),
        target_item=target_item.astype(np.int32),
        target_cat=_item_to_cat(target_item, spec.n_items, spec.n_cats),
        label=label.astype(np.float32),
        neg_item_seq=neg_item,
        neg_cat_seq=_item_to_cat(neg_item, spec.n_items, spec.n_cats),
    )


def make_ctr_dataset(spec: DatasetSpec, n_examples: int, seed: int = 0,
                     min_len_frac: float = 0.5) -> Dict[str, np.ndarray]:
    """Reference-style CTR examples: user preference → behaviors → next-item
    positives, random negatives [P §5.1.1]. Balanced labels."""
    rng = np.random.default_rng(seed)
    T = spec.seq_len
    uid = rng.integers(0, spec.n_users, size=n_examples)
    # Per-example latent preference: a small set of favored categories.
    k_fav = 5
    fav = rng.integers(1, spec.n_cats, size=(n_examples, k_fav)).astype(np.int32)
    # Behavior categories: 70% from favorites, 30% uniform noise.
    pick = rng.integers(0, k_fav, size=(n_examples, T))
    beh_cat = np.take_along_axis(fav, pick, axis=1)
    noise_mask = rng.random((n_examples, T)) < 0.3
    beh_cat = np.where(noise_mask,
                       rng.integers(1, spec.n_cats, size=(n_examples, T)),
                       beh_cat).astype(np.int32)
    item_seq = _sample_items_for_cats(rng, beh_cat, spec.n_items, spec.n_cats)
    # Left-pad to variable lengths.
    lens = rng.integers(int(T * min_len_frac), T + 1, size=n_examples)
    pos = np.arange(T)[None, :]
    seq_mask = (pos >= (T - lens[:, None])).astype(np.float32)
    item_seq = (item_seq * seq_mask).astype(np.int32)
    # Positive target: one more behavior from the preference; negative: random.
    label = (rng.random(n_examples) < 0.5).astype(np.float32)
    pos_cat = np.take_along_axis(fav, rng.integers(0, k_fav, size=(n_examples, 1)),
                                 axis=1)[:, 0]
    pos_item = _sample_items_for_cats(rng, pos_cat, spec.n_items, spec.n_cats)
    neg_item = rng.integers(1, spec.n_items, size=n_examples).astype(np.int32)
    target_item = np.where(label > 0.5, pos_item, neg_item).astype(np.int32)
    return _finalize(spec, rng, uid, item_seq, seq_mask, target_item, label)


def make_periodic_dataset(spec: DatasetSpec, n_examples: int, seed: int = 0,
                          noise_window_frac: float = 0.3,
                          k_interests: int = 3,
                          signal_prob: float = 0.8) -> Dict[str, np.ndarray]:
    """Planted long-range task: interests appear only BEFORE the trailing
    noise window; label = target category ∈ early interests. A model must
    memorize across ``noise_window`` recent steps of pure noise to solve it
    (the lifelong-modeling capability, [P §4.2], SURVEY.md §4 item 3)."""
    rng = np.random.default_rng(seed)
    T = spec.seq_len
    W = max(1, int(T * noise_window_frac))
    uid = rng.integers(0, spec.n_users, size=n_examples)
    # Disjoint pools: interest candidates in [1, half), noise in [half, n_cats)
    # — so an interest category in the history is an unambiguous signal and
    # the task's Bayes accuracy is ~1 (decodable from early history only).
    half = max(2, spec.n_cats // 2)
    interests = rng.integers(1, half,
                             size=(n_examples, k_interests)).astype(np.int32)
    # Early segment [0, T-W): mostly interest categories; late [T-W, T): noise.
    pick = rng.integers(0, k_interests, size=(n_examples, T))
    beh_cat = np.take_along_axis(interests, pick, axis=1)
    u = rng.random((n_examples, T))
    noise_cat = rng.integers(half, spec.n_cats, size=(n_examples, T))
    is_late = np.arange(T)[None, :] >= (T - W)
    beh_cat = np.where(is_late | (u >= signal_prob), noise_cat, beh_cat)
    beh_cat = beh_cat.astype(np.int32)
    item_seq = _sample_items_for_cats(rng, beh_cat, spec.n_items, spec.n_cats)
    seq_mask = np.ones((n_examples, T), dtype=np.float32)
    # Target: pos = item from an (early) interest cat; neg = item from an
    # interest-candidate category NOT in this user's set.
    label = (rng.random(n_examples) < 0.5).astype(np.float32)
    pos_cat = np.take_along_axis(
        interests, rng.integers(0, k_interests, size=(n_examples, 1)), axis=1)[:, 0]
    neg_cat = rng.integers(1, half, size=n_examples).astype(np.int32)
    # Reject accidental membership of neg_cat in interests.
    for _ in range(16):
        clash = (neg_cat[:, None] == interests).any(axis=1)
        if not clash.any():
            break
        neg_cat = np.where(clash, rng.integers(1, half, size=n_examples),
                           neg_cat).astype(np.int32)
    tcat = np.where(label > 0.5, pos_cat, neg_cat).astype(np.int32)
    target_item = _sample_items_for_cats(rng, tcat, spec.n_items, spec.n_cats)
    return _finalize(spec, rng, uid, item_seq, seq_mask, target_item, label)


def train_val_test_split(arrays: Dict[str, np.ndarray], val_frac: float = 0.1,
                         test_frac: float = 0.1):
    """Deterministic split by example index (the synthetic analogue of the
    reference's time-ordered split, SURVEY.md §3.1)."""
    n = arrays["label"].shape[0]
    n_test = int(n * test_frac)
    n_val = int(n * val_frac)
    n_train = n - n_val - n_test

    def slice_all(lo, hi):
        return {k: v[lo:hi] for k, v in arrays.items()}

    return (slice_all(0, n_train), slice_all(n_train, n_train + n_val),
            slice_all(n_train + n_val, n))
