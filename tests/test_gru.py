"""Unit tests for the GRU/AUGRU cell and scan (SURVEY.md §4 item 1)."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpmn_tpu.ops.gru import (gru_cell, gru_init, gru_input_proj, gru_sequence,
                              gru_step)


@pytest.fixture
def params():
    return gru_init(jax.random.key(0), d_in=6, d_m=4)


def naive_cell(p, x, h):
    """Direct transcription of the documented cell math."""
    d_m = h.shape[-1]
    xp = x @ p.wx + p.b
    g = h @ p.wh
    r = jax.nn.sigmoid(xp[:, :d_m] + g[:, :d_m])
    z = jax.nn.sigmoid(xp[:, d_m:2 * d_m] + g[:, d_m:2 * d_m])
    c = jnp.tanh(xp[:, 2 * d_m:] + r * g[:, 2 * d_m:])
    return (1 - z) * h + z * c


def test_cell_matches_naive(params):
    key = jax.random.key(1)
    x = jax.random.normal(key, (3, 6))
    h = jax.random.normal(jax.random.key(2), (3, 4))
    out = gru_cell(params, gru_input_proj(params, x), h)
    chex.assert_trees_all_close(out, naive_cell(params, x, h), atol=1e-6)


def test_sequence_matches_python_loop(params):
    B, T = 3, 11
    x = jax.random.normal(jax.random.key(3), (B, T, 6))
    mask = (jax.random.uniform(jax.random.key(4), (B, T)) > 0.3).astype(
        jnp.float32)
    h_seq, h_T = gru_sequence(params, x, mask=mask)
    h = jnp.zeros((B, 4))
    for t in range(T):
        h_new = naive_cell(params, x[:, t], h)
        h = mask[:, t:t + 1] * h_new + (1 - mask[:, t:t + 1]) * h
        chex.assert_trees_all_close(h_seq[:, t], h, atol=1e-5)
    chex.assert_trees_all_close(h_T, h, atol=1e-5)


def test_masked_steps_are_identity(params):
    B, T = 2, 5
    x = jax.random.normal(jax.random.key(5), (B, T, 6))
    mask = jnp.zeros((B, T))
    h_seq, h_T = gru_sequence(params, x, mask=mask)
    assert float(jnp.abs(h_seq).max()) == 0.0
    assert float(jnp.abs(h_T).max()) == 0.0


def test_augru_gate_scale_zero_freezes_state(params):
    B, T = 2, 7
    x = jax.random.normal(jax.random.key(6), (B, T, 6))
    gate = jnp.zeros((B, T))
    h_seq, h_T = gru_sequence(params, x, gate_scale=gate)
    assert float(jnp.abs(h_T).max()) == 0.0  # z'=0 => h never moves from 0


def test_augru_gate_scale_one_matches_plain(params):
    B, T = 2, 7
    x = jax.random.normal(jax.random.key(7), (B, T, 6))
    h1, _ = gru_sequence(params, x)
    h2, _ = gru_sequence(params, x, gate_scale=jnp.ones((B, T)))
    chex.assert_trees_all_close(h1, h2, atol=1e-6)


def test_grad_flows(params):
    x = jax.random.normal(jax.random.key(8), (2, 5, 6))

    def f(p):
        _, h_T = gru_sequence(p, x)
        return jnp.sum(h_T ** 2)

    grads = jax.grad(f)(params)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
        assert float(jnp.abs(leaf).max()) > 0
