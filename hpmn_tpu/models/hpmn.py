"""HPMN — Hierarchical Periodic Memory Network encoder.

Reference equivalent: the ``HPMN`` class — an L-layer hierarchical periodic
GRU memory. Layer 1 is a GRU over every event; layer l>1 fires only every
``period**(l-1)`` steps, consuming the layer-(l-1) memory as input, so higher
layers compress geometrically longer horizons into one slot each
(SURVEY.md §2.1/§3.3, [P §4.2], [B:5]).

Two mathematically identical realizations:

- :func:`encode_oracle` — ONE masked ``lax.scan`` over all T steps carrying
  every layer's slot, with ``(t+1) % period**(l-1) == 0`` firing masks. This
  mirrors the reference's single ``while_loop`` graph and is the correctness
  oracle (SURVEY.md §6 protocol).

- :func:`encode_hierarchical` — the TPU-first fast path [B:5]: layer l runs
  its OWN scan of length ``T_l = T_{l-1} // period`` over the stride-sampled
  outputs of layer l-1. Total GRU steps drop from ``T*L`` (masked) to
  ``sum_l T/period^(l-1) ~= T * period/(period-1)``, i.e. the periodic
  sparsity is exploited structurally instead of masked away.

Equivalence (incl. T not divisible by period**l — SURVEY.md §7 hard part 3):
layer l's firing positions {k*p_l - 1 : k>=1} are a subset of layer (l-1)'s
(p_{l-1} | p_l), and both paths gate updates by the same padding mask, so
layer l's input at firing step k is exactly layer (l-1)'s carried state at
that absolute position in both realizations. Property-tested in
``tests/test_hpmn_equiv.py``.

The final user memory is the stack of the L slot carries — the per-user
state that the serving path updates incrementally in O(1) amortized time per
event ([P §4.5], ``hpmn_tpu.serving``).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..ops.gru import (GRUParams, gru_init, gru_input_proj, gru_sequence,
                       gru_step)


def layer_period(period: int, layer_idx: int) -> int:
    """Update period of 1-indexed layer l: period**(l-1); layer 1 fires
    every step [P §4.2]."""
    return period ** layer_idx  # layer_idx is 0-indexed here


def init_hpmn(key: jax.Array, in_dim: int, mem_dim: int, n_layers: int,
              dtype=jnp.float32) -> Dict:
    """Per-layer GRU params: layer 0 consumes behavior embeddings (in_dim),
    layers >=1 consume the lower layer's memory (mem_dim)."""
    keys = jax.random.split(key, n_layers)
    layers: List[GRUParams] = []
    for l in range(n_layers):
        d_in = in_dim if l == 0 else mem_dim
        layers.append(gru_init(keys[l], d_in, mem_dim, dtype))
    return {"layers": layers}


def encode_oracle(params: Dict, x: jax.Array, mask: jax.Array,
                  period: int) -> jax.Array:
    """Masked single-scan HPMN (the oracle). x [B, T, d_in], mask [B, T]
    -> memory [B, L, mem_dim] (slot l = layer l's final carry)."""
    layers: List[GRUParams] = params["layers"]
    L = len(layers)
    B, T, _ = x.shape
    d_m = layers[0].wh.shape[0]

    xp0 = gru_input_proj(layers[0], x)  # hoisted input projection

    def step(carry, inputs):
        ms, t = carry  # ms: list of [B, d_m] slots; t: step index
        xp_t, m_t = inputs
        new_ms = list(ms)
        new_ms[0] = gru_step(layers[0], xp_t, ms[0], m_t)
        for l in range(1, L):
            p_l = period ** l
            fires = ((t + 1) % p_l == 0).astype(x.dtype)
            gate = m_t * fires  # firing grid AND padding mask
            xp_l = gru_input_proj(layers[l], new_ms[l - 1])
            new_ms[l] = gru_step(layers[l], xp_l, ms[l], gate)
        return (new_ms, t + 1), None

    init = ([jnp.zeros((B, d_m), x.dtype) for _ in range(L)],
            jnp.asarray(0, jnp.int32))
    (ms, _), _ = jax.lax.scan(
        step, init, (jnp.moveaxis(xp0, 1, 0), jnp.moveaxis(mask, 1, 0)))
    return jnp.stack(ms, axis=1)  # [B, L, d_m]


def encode_hierarchical(
    params: Dict, x: jax.Array, mask: jax.Array, period: int,
    gru_seq_fn: Optional[Callable] = None,
) -> jax.Array:
    """Hierarchy-of-scans HPMN (the fast path) [B:5].

    gru_seq_fn: drop-in replacement for ``ops.gru.gru_sequence`` (e.g. the
    fused Pallas kernel); signature (params, x, h0, mask) -> (h_seq, h_T).
    """
    if gru_seq_fn is None:
        gru_seq_fn = lambda p, xs, m: gru_sequence(p, xs, mask=m)
    layers: List[GRUParams] = params["layers"]
    L = len(layers)
    B, T, _ = x.shape
    d_m = layers[0].wh.shape[0]

    slots = []
    seq, m = x, mask
    for l in range(L):
        if seq.shape[1] == 0:
            # Layer never fires for this (T, period): slot stays zeros, as in
            # the oracle.
            slots.extend([jnp.zeros((B, d_m), x.dtype)] * (L - l))
            break
        with jax.named_scope(f"hpmn_layer_{l}_scan"):
            h_seq, h_T = gru_seq_fn(layers[l], seq, m)
        slots.append(h_T)
        # Stride-sample this layer's outputs at the next layer's firing grid:
        # every `period`-th element starting at index period-1.
        seq = h_seq[:, period - 1::period, :]
        m = m[:, period - 1::period]
    return jnp.stack(slots, axis=1)  # [B, L, d_m]


def encode_hierarchical_tm(params: Dict, x_tm: jax.Array,
                           mask_tm: Optional[jax.Array], period: int,
                           gru_seq_tm_fn: Callable) -> jax.Array:
    """TIME-MAJOR hierarchy of scans — the Pallas hot path [B:5].

    x_tm [T, B, d_in]; mask_tm [T, B] or None (statically full sequences).
    Embeddings are gathered straight into time-major by the caller
    (transposing the int32 id arrays, not activations), stride-sampling
    happens on the leading axis, and the layer scans consume/produce
    time-major blocks — so no activation transpose is ever materialized.
    gru_seq_tm_fn: (params, x_tm, mask_tm) -> (h_seq_tm [T,B,dm], h_T).
    Mathematically identical to :func:`encode_hierarchical` /
    :func:`encode_oracle` (tested in tests/test_pallas.py).
    """
    layers: List[GRUParams] = params["layers"]
    L = len(layers)
    T, B, _ = x_tm.shape
    d_m = layers[0].wh.shape[0]

    slots = []
    seq, m = x_tm, mask_tm
    for l in range(L):
        if seq.shape[0] == 0:
            slots.extend([jnp.zeros((B, d_m), x_tm.dtype)] * (L - l))
            break
        with jax.named_scope(f"hpmn_layer_{l}_scan"):
            h_seq, h_T = gru_seq_tm_fn(layers[l], seq, m)
        slots.append(h_T)
        seq = h_seq[period - 1::period]
        m = None if m is None else m[period - 1::period]
    return jnp.stack(slots, axis=1)  # [B, L, d_m]


def encode_hierarchical_stride_tm(params: Dict, x_tm: jax.Array, period: int,
                                  stride_fn: Callable) -> jax.Array:
    """TIME-MAJOR hierarchy with STRIDED-OUTPUT kernels — the full-mask
    flagship path. Each layer's kernel emits only the T//period rows the
    next layer consumes plus its final state (no dense h_seq stream, no XLA
    stride-slice); the kernel backward recomputes in-chunk states from
    boundaries (ops/pallas_gru.py strided variant, bit-exact vs the dense
    kernel — VERDICT r1 #5 measured accept). stride_fn:
    (layer_params, x_tm, period) -> (h_stride, h_T)."""
    layers: List[GRUParams] = params["layers"]
    L = len(layers)
    _, B, _ = x_tm.shape
    d_m = layers[0].wh.shape[0]

    slots = []
    seq = x_tm
    for l in range(L):
        if seq.shape[0] == 0:
            slots.extend([jnp.zeros((B, d_m), x_tm.dtype)] * (L - l))
            break
        with jax.named_scope(f"hpmn_layer_{l}_stride_scan"):
            seq, h_T = stride_fn(layers[l], seq, period)
        slots.append(h_T)
    return jnp.stack(slots, axis=1)  # [B, L, d_m]
