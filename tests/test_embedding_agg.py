"""ops.embedding_agg: MXU one-hot aggregation == scatter-add oracle.

Oracle-first protocol (BASELINE.md): the jnp scatter-add is the permanent
reference; the matmul aggregation must match it to f32 summation-order
tolerance, including duplicate ids, unused rows, out-of-range sentinel ids,
and N not divisible by the chunk size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpmn_tpu.ops.embedding_agg import matmul_agg, take_rows, take_small


def _scatter_oracle(ids, cot, n_rows):
    return jnp.zeros((n_rows, cot.shape[-1]), cot.dtype).at[
        jnp.clip(ids, 0, n_rows)  # clip keeps shape; OOR handled by mask
    ].add(jnp.where((ids >= 0)[:, None] & (ids < n_rows)[:, None], cot, 0))


@pytest.mark.parametrize("n_rows,n,chunk", [
    (97, 1000, 128),     # N not divisible by chunk; duplicates guaranteed
    (800, 2048, 2048),   # exactly one chunk
    (16, 5, 2048),       # N < chunk
    (1, 64, 16),         # single row: everything collapses to row 0
])
def test_matmul_agg_matches_scatter(n_rows, n, chunk):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, n_rows, size=n).astype(np.int32))
    cot = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    got = matmul_agg(ids, cot, n_rows, chunk=chunk)
    want = _scatter_oracle(ids, cot, n_rows)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matmul_agg_out_of_range_ids_drop():
    """The n_rows sentinel (used by tail padding and the sharded ownership
    mask) must contribute nothing."""
    ids = jnp.asarray([0, 5, 99, 100, 1000, 5, -0], dtype=jnp.int32)
    # note: ids >= n_rows only (negative ids are never produced by callers)
    cot = jnp.ones((7, 4), jnp.float32)
    got = matmul_agg(ids, cot, 100, chunk=4)
    want = _scatter_oracle(ids, cot, 100)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # contributing occurrences: rows 0(x2), 5(x2), 99 -> 5 rows of ones(4)
    assert float(got.sum()) == pytest.approx(20.0)


def test_take_small_grad_matches_take():
    """d take_small / d table == d jnp.take / d table under a nonlinear
    loss, with heavy duplicate ids."""
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((50, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 50, size=(4, 37)).astype(np.int32))
    w = jnp.asarray(rng.standard_normal((4, 37, 8)).astype(np.float32))

    def loss_fast(t):
        return jnp.sum(jnp.tanh(take_small(t, ids)) * w)

    def loss_ref(t):
        return jnp.sum(jnp.tanh(jnp.take(t, ids, axis=0)) * w)

    v1, g1 = jax.value_and_grad(loss_fast)(table)
    v2, g2 = jax.value_and_grad(loss_ref)(table)
    assert float(v1) == float(v2)  # forward is the same gather
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


def test_take_rows_routes_by_vocab_size():
    """Both routes produce the same forward values."""
    rng = np.random.default_rng(2)
    small = jnp.asarray(rng.standard_normal((10, 4)).astype(np.float32))
    big = jnp.asarray(rng.standard_normal((5000, 4)).astype(np.float32))
    ids_s = jnp.asarray([1, 2, 2, 9], dtype=jnp.int32)
    ids_b = jnp.asarray([0, 4999, 17, 17], dtype=jnp.int32)
    np.testing.assert_array_equal(take_rows(small, ids_s),
                                  jnp.take(small, ids_s, axis=0))
    np.testing.assert_array_equal(take_rows(big, ids_b),
                                  jnp.take(big, ids_b, axis=0))


def test_dense_lookup_grads_unchanged():
    """models.embedding.dense_lookup (now routed through take_rows) produces
    the same lookup and table gradients as the plain double-gather."""
    from hpmn_tpu.models.embedding import dense_lookup, init_embedding

    emb = init_embedding(jax.random.key(0), n_items=300, n_cats=20,
                         emb_dim=8)
    rng = np.random.default_rng(3)
    item = jnp.asarray(rng.integers(0, 300, size=(2, 11)).astype(np.int32))
    cat = jnp.asarray(rng.integers(0, 20, size=(2, 11)).astype(np.int32))

    def loss(e, fn):
        return jnp.sum(fn(e, item, cat) ** 2)

    def plain(e, i, c):
        return jnp.concatenate([jnp.take(e["item"], i, axis=0),
                                jnp.take(e["cat"], c, axis=0)], axis=-1)

    g1 = jax.grad(loss)(emb, dense_lookup)
    g2 = jax.grad(loss)(emb, plain)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                         atol=1e-6), g1, g2)
