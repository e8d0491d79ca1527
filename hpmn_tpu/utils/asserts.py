"""Shape/dtype assertions at module boundaries.

Reference equivalent: none — the reference relies on TF graph-build errors.
Rebuild policy (SURVEY.md §5.2): JAX's functional model precludes data
races; the real hazards are silent shape/dtype drift, guarded here with
chex asserts that run at trace time (zero runtime cost under jit).
"""

from __future__ import annotations

import chex
import jax.numpy as jnp

from ..data.schema import Batch


def validate_batch(batch: Batch) -> None:
    """Trace-time validation of the Batch contract (schema.py)."""
    B, T = batch.item_seq.shape
    chex.assert_shape(batch.item_seq, (B, T))
    chex.assert_shape(batch.cat_seq, (B, T))
    chex.assert_shape(batch.seq_mask, (B, T))
    chex.assert_shape(batch.neg_item_seq, (B, T))
    chex.assert_shape(batch.neg_cat_seq, (B, T))
    chex.assert_shape(batch.target_item, (B,))
    chex.assert_shape(batch.target_cat, (B,))
    chex.assert_shape(batch.label, (B,))
    chex.assert_shape(batch.uid, (B,))
    for name in ("item_seq", "cat_seq", "target_item", "target_cat",
                 "neg_item_seq", "neg_cat_seq", "uid"):
        chex.assert_type(getattr(batch, name), jnp.int32)
