"""DIEN baseline — Deep Interest Evolution Network.

Reference equivalent: the ``DIEN`` class (SURVEY.md §2.1/§3.4, [P §5.1.3],
[B:10]). Two-stage encoder:

1. *Interest extraction*: GRU over behavior embeddings -> h_t, with an
   optional auxiliary loss pushing h_t to predict the NEXT behavior against
   a sampled negative (``neg_item_seq`` in the batch schema).
2. *Interest evolution*: AUGRU — a second GRU whose update gate is scaled by
   the attention of each h_t against the target item — so evolution
   concentrates on target-relevant interest.

TPU notes: both stages are the same hoisted-projection GRU scan as HPMN
(AUGRU = ``gate_scale`` operand), so the fused Pallas kernel covers DIEN for
free (SURVEY.md §2.2). The aux loss is computed in one batched einsum over
all timesteps — no per-step Python.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.gru import gru_init, gru_sequence
from .readout import init_readout, attention_readout


def init_dien(key: jax.Array, in_dim: int, mem_dim: int, attn_dim: int,
              dtype=jnp.float32) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = (6.0 / (mem_dim + in_dim)) ** 0.5
    return {
        "gru1": gru_init(k1, in_dim, mem_dim, dtype),
        "augru": gru_init(k2, mem_dim, mem_dim, dtype),
        "attn": init_readout(k3, mem_dim, in_dim, attn_dim, dtype),
        # Projects interest states into embedding space for the aux loss.
        "aux_w": jax.random.uniform(k4, (mem_dim, in_dim), dtype, -s, s),
    }


def auxiliary_loss(params: Dict, h_seq: jax.Array, x: jax.Array,
                   x_neg: jax.Array, mask: jax.Array) -> jax.Array:
    """BCE(sigma(proj(h_t)·e_{t+1}), 1) + BCE(sigma(proj(h_t)·ê_{t+1}), 0),
    masked to positions where both t and t+1 are valid [P §5.1.3]."""
    hp = h_seq[:, :-1, :] @ params["aux_w"]  # [B, T-1, in_dim]
    pos = jnp.einsum("btd,btd->bt", hp, x[:, 1:, :])
    neg = jnp.einsum("btd,btd->bt", hp, x_neg[:, 1:, :])
    m = mask[:, :-1] * mask[:, 1:]
    per = (jnp.maximum(pos, 0) - pos + jnp.log1p(jnp.exp(-jnp.abs(pos)))
           + jnp.maximum(neg, 0) + jnp.log1p(jnp.exp(-jnp.abs(neg))))
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def encode(params: Dict, x: jax.Array, mask: jax.Array, target: jax.Array,
           x_neg: Optional[jax.Array] = None, use_aux_loss: bool = True,
           gru_seq_fn: Optional[Callable] = None,
           ) -> Tuple[jax.Array, jax.Array]:
    """-> (final evolved interest [B, mem_dim], aux loss scalar)."""
    if gru_seq_fn is None:
        gru_seq_fn = lambda p, xs, m, a=None: gru_sequence(
            p, xs, mask=m, gate_scale=a)
    h_seq, _ = gru_seq_fn(params["gru1"], x, mask)
    aux = jnp.asarray(0.0, x.dtype)
    if use_aux_loss and x_neg is not None:
        aux = auxiliary_loss(params, h_seq, x, x_neg, mask)
    # Target attention over interest states -> per-step AUGRU gate scale.
    _, alpha = attention_readout(params["attn"], h_seq, target,
                                 slot_mask=mask, return_weights=True)
    _, h_T = gru_seq_fn(params["augru"], h_seq, mask, alpha)
    return h_T, aux


def encode_tm(params: Dict, x_tm: jax.Array, mask_tm: Optional[jax.Array],
              target: jax.Array, x_neg_tm: Optional[jax.Array],
              use_aux_loss: bool, gru_seq_tm_fn: Callable,
              ) -> Tuple[jax.Array, jax.Array]:
    """TIME-MAJOR DIEN for the fused-kernel hot path (same math as
    :func:`encode`; tested for parity in tests/test_pallas.py).
    x_tm [T,B,d], mask_tm [T,B] or None, target [B,d]."""
    f32 = jnp.float32
    h_seq_tm, _ = gru_seq_tm_fn(params["gru1"], x_tm, mask_tm)
    hs = h_seq_tm.astype(f32)
    aux = jnp.asarray(0.0, f32)
    if use_aux_loss and x_neg_tm is not None:
        hp = hs[:-1] @ params["aux_w"]  # [T-1, B, in_dim]
        pos = jnp.einsum("tbd,tbd->tb", hp, x_tm[1:].astype(f32))
        neg = jnp.einsum("tbd,tbd->tb", hp, x_neg_tm[1:].astype(f32))
        per = (jnp.maximum(pos, 0) - pos + jnp.log1p(jnp.exp(-jnp.abs(pos)))
               + jnp.maximum(neg, 0) + jnp.log1p(jnp.exp(-jnp.abs(neg))))
        if mask_tm is None:
            aux = jnp.mean(per)
        else:
            m = mask_tm[:-1] * mask_tm[1:]
            aux = jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
    # Target attention over time (additive scoring, softmax over T).
    att = params["attn"]
    e = jnp.tanh(hs @ att["wm"]
                 + (target @ att["wq"] + att["b"])[None, :, :])
    scores = e @ att["v"]  # [T, B]
    if mask_tm is not None:
        scores = jnp.where(mask_tm > 0, scores, jnp.finfo(f32).min)
    alpha = jax.nn.softmax(scores, axis=0)
    if mask_tm is not None:
        alpha = jnp.where(jnp.sum(mask_tm, 0, keepdims=True) > 0, alpha, 0.0)
    _, h_T = gru_seq_tm_fn(params["augru"], h_seq_tm, mask_tm, alpha)
    return h_T, aux
