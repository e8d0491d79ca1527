"""Batch schema shared by every model and the data pipeline.

Mirrors the reference pipeline's example tuple
``(uid, item_seq, cat_seq, seq_len/mask, target_item, target_cat, label)``
(SURVEY.md §2.1 "Data loader", [P §5.1.1]) with one addition made on day one
so DIEN's auxiliary loss is not a pipeline retrofit (SURVEY.md §7 hard part 5):
per-position sampled negative items ``neg_item_seq`` / ``neg_cat_seq``.

Layout conventions (chosen for the TPU scan decomposition, not inherited from
the reference):

- Sequences are **left-padded**: invalid (pad) positions come first, the most
  recent event sits at index T-1. This pins the hierarchical memory layers'
  periodic firing grid to fixed array positions counted from the sequence end,
  independent of each example's true length.
- ``seq_mask`` is 1.0 at valid positions. Masked scan steps are identity
  updates on the memory carry.
- All id arrays are int32 (TPU-native); labels/masks are float32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Batch:
    """One training/eval batch. Shapes use B = batch, T = max sequence length."""

    uid: jax.Array  # int32 [B] user id (serving/per-user-memory key)
    item_seq: jax.Array  # int32 [B, T] behavior item ids, left-padded with 0
    cat_seq: jax.Array  # int32 [B, T] behavior category ids, left-padded with 0
    seq_mask: jax.Array  # float32 [B, T] 1.0 where valid
    target_item: jax.Array  # int32 [B]
    target_cat: jax.Array  # int32 [B]
    label: jax.Array  # float32 [B] binary CTR label
    # Per-position sampled negatives for DIEN's auxiliary loss [P §5.1.3].
    # neg_item_seq[b, t] is a negative for predicting the behavior at t+1.
    neg_item_seq: jax.Array  # int32 [B, T]
    neg_cat_seq: jax.Array  # int32 [B, T]

    @property
    def batch_size(self) -> int:
        return self.item_seq.shape[0]

    @property
    def seq_len(self) -> int:
        return self.item_seq.shape[1]


def batch_from_numpy(arrays: dict, indices: Optional[np.ndarray] = None) -> Batch:
    """Build a Batch from a dict of numpy arrays, optionally row-sliced.

    Row-sliced assembly uses the native threaded gather when built
    (data/native_batcher.py — one GIL-releasing call for all fields);
    numpy fancy indexing is the always-available fallback and the oracle
    (equality tested in tests/test_native_preprocess.py)."""
    if indices is not None:
        from . import native_batcher

        names = [f.name for f in dataclasses.fields(Batch)]
        if native_batcher.available() and all(
                isinstance(arrays[n], np.ndarray) for n in names):
            return Batch(**native_batcher.gather(
                {n: arrays[n] for n in names}, indices))

    def take(name):
        a = arrays[name]
        return a if indices is None else a[indices]

    return Batch(
        uid=take("uid"),
        item_seq=take("item_seq"),
        cat_seq=take("cat_seq"),
        seq_mask=take("seq_mask"),
        target_item=take("target_item"),
        target_cat=take("target_cat"),
        label=take("label"),
        neg_item_seq=take("neg_item_seq"),
        neg_cat_seq=take("neg_cat_seq"),
    )


_ID_FIELDS = ("item_seq", "cat_seq", "target_item", "target_cat",
              "neg_item_seq", "neg_cat_seq")


def can_compact(n_items: int, n_cats: int) -> bool:
    """Wire compaction is exact iff every id fits uint16."""
    return max(n_items, n_cats) < (1 << 16)


def compact_batch(batch: Batch) -> Batch:
    """Wire-compact a HOST batch: id fields -> uint16, seq_mask -> uint8
    (uid/label untouched — uids may exceed 2^16). Halves the bytes shipped
    host->device per step, the measured in-loop bound on relayed links and
    the per-chip feed bandwidth when one host drives many chips
    (BASELINE.md). Exact by the ``can_compact`` gate (ids < vocab < 2^16;
    masks are 0/1); ``expand_batch`` restores the schema dtypes inside the
    jitted step, so every consumer past ``apply_model`` sees the standard
    contract. No-op on already-compact batches."""
    if np.asarray(batch.item_seq).dtype == np.uint16:
        return batch
    kw = {f: np.asarray(getattr(batch, f)).astype(np.uint16)
          for f in _ID_FIELDS}
    kw["seq_mask"] = np.asarray(batch.seq_mask).astype(np.uint8)
    return dataclasses.replace(batch, **kw)


def expand_batch(batch: Batch) -> Batch:
    """Inverse of :func:`compact_batch`, jit-safe: cast compact fields back
    to the schema dtypes (int32 ids, float32 mask). No-op when the batch is
    already in schema dtypes — every model path calls this
    unconditionally."""
    if batch.item_seq.dtype != jnp.uint16 \
            and batch.seq_mask.dtype == jnp.float32:
        return batch
    kw = {f: getattr(batch, f).astype(jnp.int32) for f in _ID_FIELDS}
    kw["seq_mask"] = batch.seq_mask.astype(jnp.float32)
    return dataclasses.replace(batch, **kw)


def dummy_batch(batch_size: int, seq_len: int, n_items: int = 1000,
                n_cats: int = 50, seed: int = 0) -> Batch:
    """Small random batch for tests / compile checks / dry runs."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(seq_len // 2, seq_len + 1, size=batch_size)
    pos = np.arange(seq_len)[None, :]
    mask = (pos >= (seq_len - lens[:, None])).astype(np.float32)
    item = rng.integers(1, n_items, size=(batch_size, seq_len)).astype(np.int32)
    item = (item * mask).astype(np.int32)
    return Batch(
        uid=np.arange(batch_size, dtype=np.int32),
        item_seq=item,
        cat_seq=(item % n_cats).astype(np.int32),
        seq_mask=mask,
        target_item=rng.integers(1, n_items, size=batch_size).astype(np.int32),
        target_cat=rng.integers(0, n_cats, size=batch_size).astype(np.int32),
        label=rng.integers(0, 2, size=batch_size).astype(np.float32),
        neg_item_seq=rng.integers(1, n_items, size=(batch_size, seq_len)).astype(np.int32),
        neg_cat_seq=rng.integers(0, n_cats, size=(batch_size, seq_len)).astype(np.int32),
    )


def to_device_arrays(batch: Batch) -> Batch:
    return jax.tree.map(jnp.asarray, batch)
