"""PReLU MLP prediction tower.

Reference equivalent: ``build_fc_net``/``prelu`` — PReLU MLP on
[read vector ; target emb] -> sigmoid -> log-loss (SURVEY.md §2.1
"Prediction tower", [P §4.3]). Returns logits; the sigmoid lives in the loss
for numerical stability.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """PReLU with a learned per-feature slope [P §4.3]."""
    return jnp.where(x >= 0, x, alpha * x)


def init_tower(key: jax.Array, d_in: int, hidden: Sequence[int],
               dtype=jnp.float32) -> Dict:
    dims = [d_in, *hidden, 1]
    layers = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        s = (6.0 / (a + b)) ** 0.5
        layers.append({
            "w": jax.random.uniform(sub, (a, b), dtype, -s, s),
            "b": jnp.zeros((b,), dtype),
            # PReLU slope for every layer except the final logit layer.
            "alpha": jnp.full((b,), 0.25, dtype) if i < len(dims) - 2 else None,
        })
    return {"layers": layers}


def apply_tower(params: Dict, x: jax.Array) -> jax.Array:
    """x [B, d_in] -> logits [B]."""
    h = x
    for layer in params["layers"]:
        h = h @ layer["w"] + layer["b"]
        if layer["alpha"] is not None:
            h = prelu(h, layer["alpha"])
    return h[..., 0]
