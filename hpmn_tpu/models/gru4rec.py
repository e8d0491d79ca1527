"""GRU4Rec-style RNN baseline.

Reference equivalent: the ``GRU4Rec`` class — a single GRU over the behavior
sequence; final hidden state concat target -> tower; CTR adaptation with
log-loss rather than the original session-ranking loss (SURVEY.md §2.1,
[P §5.1.3], [B:11]).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.gru import gru_init, gru_sequence


def init_gru4rec(key: jax.Array, in_dim: int, mem_dim: int,
                 dtype=jnp.float32) -> Dict:
    return {"gru": gru_init(key, in_dim, mem_dim, dtype)}


def encode(params: Dict, x: jax.Array, mask: jax.Array,
           gru_seq_fn: Optional[Callable] = None) -> jax.Array:
    """x [B, T, d_in], mask [B, T] -> user state [B, mem_dim]."""
    if gru_seq_fn is None:
        gru_seq_fn = lambda p, xs, m: gru_sequence(p, xs, mask=m)
    _, h_T = gru_seq_fn(params["gru"], x, mask)
    return h_T
