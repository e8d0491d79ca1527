"""Attentive memory readout.

Reference equivalent: attention over the L memory slots with the target-item
embedding as query, softmax over slots, weighted-sum read vector
(SURVEY.md §2.1 "HPMN readout", [P §4.3]). Additive (Bahdanau) scoring:

    s_l = v^T tanh(Wm m_l + Wq q + b);  alpha = softmax_l(s);  r = sum alpha_l m_l

Also used by RUM's slot read and (per-timestep) DIEN's target attention.
The fused Pallas version lives in ``hpmn_tpu.ops.pallas_readout``; this jnp
form is its test oracle and the XLA fallback.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def init_readout(key: jax.Array, mem_dim: int, query_dim: int, attn_dim: int,
                 dtype=jnp.float32) -> Dict:
    km, kq, kv = jax.random.split(key, 3)
    s_m = (6.0 / (mem_dim + attn_dim)) ** 0.5
    s_q = (6.0 / (query_dim + attn_dim)) ** 0.5
    return {
        "wm": jax.random.uniform(km, (mem_dim, attn_dim), dtype, -s_m, s_m),
        "wq": jax.random.uniform(kq, (query_dim, attn_dim), dtype, -s_q, s_q),
        "b": jnp.zeros((attn_dim,), dtype),
        "v": jax.random.uniform(kv, (attn_dim,), dtype,
                                -(3.0 / attn_dim) ** 0.5,
                                (3.0 / attn_dim) ** 0.5),
    }


def attention_readout(params: Dict, memory: jax.Array, query: jax.Array,
                      slot_mask: Optional[jax.Array] = None,
                      return_weights: bool = False):
    """memory [B, L, dm], query [B, dq] -> read [B, dm].

    slot_mask [B, L] (optional): 1.0 for valid slots — used when attending
    over per-timestep states with padding (DIEN) or unfired layers.
    """
    e = jnp.tanh(memory @ params["wm"] + (query @ params["wq"] + params["b"])[:, None, :])
    scores = e @ params["v"]  # [B, L]
    if slot_mask is not None:
        scores = jnp.where(slot_mask > 0, scores, jnp.finfo(scores.dtype).min)
    alpha = jax.nn.softmax(scores, axis=-1)
    if slot_mask is not None:
        # All-masked rows (empty sequences) read zeros, not NaNs.
        alpha = jnp.where(jnp.sum(slot_mask, -1, keepdims=True) > 0, alpha, 0.0)
    read = jnp.einsum("bl,bld->bd", alpha, memory)
    if return_weights:
        return read, alpha
    return read
