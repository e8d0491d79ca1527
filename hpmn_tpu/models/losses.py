"""Losses: BCE, HPMN covariance regularizer, L2.

Reference equivalents: sigmoid cross-entropy log-loss [P §4.3], the
slot-decorrelation covariance penalty ``cov_loss`` [P §4.4] (SURVEY.md §2.1),
and per-dataset L2 weight decay [P §5.1.2].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, labels: jax.Array,
                    weights: jax.Array | None = None) -> jax.Array:
    """Numerically stable mean binary cross-entropy."""
    # log(1+exp(-|x|)) + max(x,0) - x*y
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if weights is None:
        return jnp.mean(per)
    return jnp.sum(per * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def covariance_regularizer(memory: jax.Array) -> jax.Array:
    """Off-diagonal covariance penalty over HPMN's L memory slots [P §4.4].

    memory: [B, L, d]. Per example, C = (1/d) Mc @ Mc^T with Mc the
    feature-centered slots; the loss is the mean squared off-diagonal mass,
    pushing different layers to memorize distinct patterns.
    """
    B, L, d = memory.shape
    mc = memory - jnp.mean(memory, axis=-1, keepdims=True)
    cov = jnp.einsum("bld,bmd->blm", mc, mc) / d  # [B, L, L]
    off = cov * (1.0 - jnp.eye(L, dtype=memory.dtype))
    return jnp.mean(jnp.sum(off ** 2, axis=(-1, -2)))


def l2_regularizer(params) -> jax.Array:
    """Sum of squared weights over all >=2-D params (embeddings included),
    skipping biases/PReLU slopes as the reference-style TF code would via
    collection filtering."""
    leaves = jax.tree.leaves(params)
    total = 0.0
    for leaf in leaves:
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            total = total + jnp.sum(leaf.astype(jnp.float32) ** 2)
    return total


def l2_parts(params):
    """L2 split into (embedding tables, everything else) — what the sharded
    step needs for exact metrics: table rows are sharded over the model
    axis (psum the table part), dense params are replicated (their part is
    already global)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    table = jnp.float32(0.0)
    dense = jnp.float32(0.0)
    for path, leaf in flat:
        if not (hasattr(leaf, "ndim") and leaf.ndim >= 2):
            continue
        keys = [getattr(p, "key", getattr(p, "name", getattr(p, "idx", None)))
                for p in path]
        sq = jnp.sum(leaf.astype(jnp.float32) ** 2)
        if "embedding" in keys:
            table = table + sq
        else:
            dense = dense + sq
    return table, dense
