"""RUM baseline — external user memory network.

Reference equivalent: the ``RUM`` class with ``memory_read``/``memory_write``
(SURVEY.md §2.1, [P §5.1.3], [B:11]): an NTM-style K-slot per-user memory;
soft read by target-query attention; erase/add write per behavior.

Realized as one ``lax.scan`` over T carrying the memory [B, K, d]:

    write weights  w_t = softmax_k(beta * <x̂_t, key_k>)
    erase          e_t = sigmoid(We x̂_t);  add  a_t = tanh(Wa x̂_t)
    M <- M * (1 - w_t ⊗ e_t) + w_t ⊗ a_t      (masked steps: identity)

    read weights   r = softmax_k(beta * <q̂, key_k>);  read = sum_k r_k M_k
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def init_rum(key: jax.Array, in_dim: int, mem_dim: int, n_slots: int,
             dtype=jnp.float32) -> Dict:
    kk, kp, ke, ka, kq = jax.random.split(key, 5)
    s = (6.0 / (in_dim + mem_dim)) ** 0.5
    return {
        "keys": jax.random.normal(kk, (n_slots, mem_dim), dtype) * mem_dim ** -0.5,
        "proj": jax.random.uniform(kp, (in_dim, mem_dim), dtype, -s, s),
        "erase": jax.random.uniform(ke, (mem_dim, mem_dim), dtype, -s, s),
        "add": jax.random.uniform(ka, (mem_dim, mem_dim), dtype, -s, s),
        "qproj": jax.random.uniform(kq, (in_dim, mem_dim), dtype, -s, s),
        "beta": jnp.asarray(1.0, dtype),
    }


def _address(keys: jax.Array, q: jax.Array, beta: jax.Array) -> jax.Array:
    """Cosine addressing: q [B, d] vs keys [K, d] -> weights [B, K]."""
    qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
    kn = keys / (jnp.linalg.norm(keys, axis=-1, keepdims=True) + 1e-6)
    return jax.nn.softmax(beta * qn @ kn.T, axis=-1)


def write_memory(params: Dict, x: jax.Array, mask: jax.Array) -> jax.Array:
    """The target-INDEPENDENT half of RUM: scan the erase/add writes over
    the behavior sequence -> memory [B, K, mem_dim]. Split out so lifelong
    serving can persist the memory per user and update it per event
    (serving/protocol.py — the write address comes from the event, not the
    target, so RUM qualifies for [P §4.5]-style O(1) serving)."""
    B, T, _ = x.shape
    K, d = params["keys"].shape
    # Hoist all per-step projections out of the scan (one MXU matmul each).
    xh = x @ params["proj"]  # [B, T, d]
    e_all = jax.nn.sigmoid(xh @ params["erase"])
    a_all = jnp.tanh(xh @ params["add"])
    w_all = _address(params["keys"], xh.reshape(B * T, d),
                     params["beta"]).reshape(B, T, K)

    def step(M, inputs):
        w, e, a, m = inputs  # [B,K], [B,d], [B,d], [B]
        we = w[:, :, None] * e[:, None, :]  # [B, K, d]
        wa = w[:, :, None] * a[:, None, :]
        M_new = M * (1.0 - we) + wa
        M = jnp.where(m[:, None, None] > 0, M_new, M)
        return M, None

    M0 = jnp.zeros((B, K, d), x.dtype)
    xs = (jnp.moveaxis(w_all, 1, 0), jnp.moveaxis(e_all, 1, 0),
          jnp.moveaxis(a_all, 1, 0), jnp.moveaxis(mask, 1, 0))
    M, _ = jax.lax.scan(step, M0, xs)
    return M


def encode(params: Dict, x: jax.Array, mask: jax.Array, target: jax.Array,
           ) -> jax.Array:
    """x [B, T, in_dim], target [B, in_dim] -> read vector [B, mem_dim]."""
    M = write_memory(params, x, mask)
    r = _address(params["keys"], target @ params["qproj"], params["beta"])
    return jnp.einsum("bk,bkd->bd", r, M)
