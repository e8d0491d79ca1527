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
                   dtype=jnp.float32) -> Dict[str, jax.Array]:
    ki, kc = jax.random.split(key)
    scale = emb_dim ** -0.5
    return {
        "item": jax.random.normal(ki, (n_items, emb_dim), dtype) * scale,
        "cat": jax.random.normal(kc, (n_cats, emb_dim), dtype) * scale,
    }


def dense_lookup(emb: Dict[str, jax.Array], item_ids: jax.Array,
                 cat_ids: jax.Array) -> jax.Array:
    """Plain gather: ids [...] -> behavior embedding [..., 2*emb_dim]."""
    return jnp.concatenate(
        [jnp.take(emb["item"], item_ids, axis=0),
         jnp.take(emb["cat"], cat_ids, axis=0)], axis=-1)
