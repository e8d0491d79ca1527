"""Embedding module.

Reference equivalent: ``tf.get_variable`` item-id and category-id tables +
``embedding_lookup``; behavior embedding = concat(item emb, cat emb)
(SURVEY.md §2.1 "Embedding module", [P §4.1], [B:5]).

The lookup is pluggable: models call whatever ``lookup_fn`` they are given,
so the single-device dense gather here can be swapped for the row-sharded
collective lookup in ``hpmn_tpu.parallel.embedding_sharding`` without
touching model code.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def init_embedding(key: jax.Array, n_items: int, n_cats: int, emb_dim: int,
                   dtype=jnp.float32, n_users: int = 0) -> Dict[str, jax.Array]:
    ki, kc, ku = jax.random.split(key, 3)
    scale = emb_dim ** -0.5
    emb = {
        "item": jax.random.normal(ki, (n_items, emb_dim), dtype) * scale,
        "cat": jax.random.normal(kc, (n_cats, emb_dim), dtype) * scale,
    }
    if n_users > 0:
        # Optional user-id table feeding the tower (SURVEY.md §2.1 tower
        # row's "(; user-emb)" input); row-shardable like item/cat.
        emb["user"] = jax.random.normal(ku, (n_users, emb_dim), dtype) * scale
    return emb


def dense_lookup(emb: Dict[str, jax.Array], item_ids: jax.Array,
                 cat_ids: jax.Array) -> jax.Array:
    """Gather: ids [...] -> behavior embedding [..., 2*emb_dim].

    Forward is a plain gather for both tables; the backward aggregation of
    cotangent rows routes per table through ``ops.embedding_agg.take_rows``:
    small vocabularies (the category table) aggregate on the MXU via chunked
    one-hot matmuls instead of XLA's sort-based scatter — the scatter's sort
    of B*T payload rows was ~25% of the XLong train step (ARCHITECTURE.md
    §4)."""
    from ..ops.embedding_agg import take_rows

    return jnp.concatenate(
        [take_rows(emb["item"], item_ids),
         take_rows(emb["cat"], cat_ids)], axis=-1)
