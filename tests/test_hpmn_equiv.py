"""HPMN oracle == hierarchical fast path, for all (T, L, period) combos
including T not divisible by period**l (SURVEY.md §4 item 2, §7 hard part 3).
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hpmn_tpu.models.hpmn import encode_hierarchical, encode_oracle, init_hpmn


def _random_inputs(B, T, d_in, seed=0, full_mask=False):
    kx, km = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(kx, (B, T, d_in))
    if full_mask:
        mask = jnp.ones((B, T))
    else:
        lens = jax.random.randint(km, (B,), 1, T + 1)
        pos = jnp.arange(T)[None, :]
        mask = (pos >= (T - lens[:, None])).astype(jnp.float32)
    return x, mask


@pytest.mark.parametrize("T,L,period", [
    (8, 3, 2), (9, 2, 3), (10, 3, 3), (27, 3, 3), (100, 4, 3),
    (7, 3, 2),  # T odd, not divisible by any period power
    (5, 4, 2),  # top layers never fire (T < period**l)
    (1, 3, 2),  # single step
])
def test_oracle_equals_hierarchical(T, L, period):
    d_in, d_m, B = 6, 5, 4
    params = init_hpmn(jax.random.key(42), d_in, d_m, L)
    x, mask = _random_inputs(B, T, d_in, seed=T * 31 + L)
    mo = encode_oracle(params, x, mask, period)
    mh = encode_hierarchical(params, x, mask, period)
    chex.assert_trees_all_close(mo, mh, atol=1e-5)


@settings(max_examples=100, deadline=None)
@given(T=st.integers(1, 40), L=st.integers(1, 4), period=st.integers(2, 5),
       seed=st.integers(0, 10))
@pytest.mark.heavy
def test_oracle_equals_hierarchical_property(T, L, period, seed):
    d_in, d_m, B = 3, 4, 2
    params = init_hpmn(jax.random.key(seed), d_in, d_m, L)
    x, mask = _random_inputs(B, T, d_in, seed=seed)
    mo = encode_oracle(params, x, mask, period)
    mh = encode_hierarchical(params, x, mask, period)
    chex.assert_trees_all_close(mo, mh, atol=1e-5)


def test_gradients_agree():
    T, L, period = 20, 3, 2
    d_in, d_m, B = 4, 3, 2
    params = init_hpmn(jax.random.key(0), d_in, d_m, L)
    x, mask = _random_inputs(B, T, d_in, seed=9)

    def loss(p, enc):
        return jnp.sum(enc(p, x, mask, period) ** 2)

    go = jax.grad(lambda p: loss(p, encode_oracle))(params)
    gh = jax.grad(lambda p: loss(p, encode_hierarchical))(params)
    chex.assert_trees_all_close(go, gh, atol=1e-4)


def test_unfired_layers_are_zero():
    # T < period**(l-1) for the top layer -> its slot must be exactly zero.
    params = init_hpmn(jax.random.key(0), 4, 3, 4)
    x, mask = _random_inputs(2, 5, 4, seed=1, full_mask=True)
    m = encode_hierarchical(params, x, mask, period=3)  # layer 4: p=27 > 5
    assert float(jnp.abs(m[:, 3]).max()) == 0.0
    mo = encode_oracle(params, x, mask, period=3)
    assert float(jnp.abs(mo[:, 3]).max()) == 0.0
