"""Pallas kernel unit tests vs the jnp oracles (SURVEY.md §4 item 1) —
interpreter mode on CPU; the compiled path is exercised on the real chip by
bench.py and the verify flow."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hpmn_tpu.ops.pallas_gru as pg
import hpmn_tpu.ops.pallas_readout as pr
from hpmn_tpu.configs import get_config
from hpmn_tpu.data.schema import dummy_batch, to_device_arrays
from hpmn_tpu.models import init_model, loss_fn
from hpmn_tpu.models.hpmn import (encode_hierarchical, encode_hierarchical_tm,
                                  encode_oracle, init_hpmn)
from hpmn_tpu.models.readout import attention_readout, init_readout
from hpmn_tpu.ops.gru import gru_init, gru_sequence


@pytest.fixture(autouse=True)
def _interpret_mode():
    pg._INTERPRET = True
    pr._INTERPRET = True
    yield
    pg._INTERPRET = False
    pr._INTERPRET = False


def _inputs(B=8, T=13, d_in=6, seed=0):
    kx, km, ka = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(kx, (B, T, d_in))
    mask = (jax.random.uniform(km, (B, T)) > 0.3).astype(jnp.float32)
    scale = jax.random.uniform(ka, (B, T))
    return x, mask, scale


@pytest.mark.parametrize("use_mask,use_scale", [
    (False, False), (True, False), (True, True)])
def test_forward_matches_oracle(use_mask, use_scale):
    params = gru_init(jax.random.key(0), 6, 4)
    x, mask, scale = _inputs()
    m = mask if use_mask else None
    a = scale if use_scale else None
    h1, hT1 = gru_sequence(params, x, mask=m, gate_scale=a)
    h2, hT2 = pg.pallas_gru_sequence(params, x, mask=m, gate_scale=a)
    chex.assert_trees_all_close(h1, h2, atol=1e-5)
    chex.assert_trees_all_close(hT1, hT2, atol=1e-5)


def test_gradients_match_oracle():
    params = gru_init(jax.random.key(0), 6, 4)
    x, mask, scale = _inputs()

    def loss(seq_fn, p, x, a):
        h, hT = seq_fn(p, x, mask=mask, gate_scale=a)
        return jnp.sum(jnp.sin(h)) + jnp.sum(hT ** 2)

    g1 = jax.grad(lambda *args: loss(gru_sequence, *args),
                  argnums=(0, 1, 2))(params, x, scale)
    g2 = jax.grad(lambda *args: loss(pg.pallas_gru_sequence, *args),
                  argnums=(0, 1, 2))(params, x, scale)
    chex.assert_trees_all_close(g1, g2, atol=1e-4)


def test_time_major_entry_point():
    params = gru_init(jax.random.key(1), 6, 4)
    x, mask, _ = _inputs(seed=2)
    h1, hT1 = gru_sequence(params, x, mask=mask)
    h2_tm, hT2 = pg.pallas_gru_sequence_tm(params, jnp.moveaxis(x, 0, 1),
                                           mask_tm=mask.T)
    chex.assert_trees_all_close(h1, jnp.moveaxis(h2_tm, 0, 1), atol=1e-5)
    chex.assert_trees_all_close(hT1, hT2, atol=1e-5)


from hypothesis import given, settings, strategies as st  # noqa: E402


@pytest.mark.heavy
@settings(max_examples=30, deadline=None)
@given(B=st.integers(1, 9), T=st.integers(1, 24),
       d_in=st.sampled_from([1, 3, 8]), d_m=st.sampled_from([1, 4, 8]),
       use_mask=st.booleans(), use_scale=st.booleans(),
       seed=st.integers(0, 5))
def test_kernel_matches_oracle_property(B, T, d_in, d_m, use_mask,
                                        use_scale, seed):
    """Randomized-shape sweep (VERDICT r2 weak #5): the fused kernel ==
    the jnp oracle in values and grads over random (B, T, d_in, d_m) and
    every mask/gate-scale operand combination."""
    pg._INTERPRET = True
    try:
        params = gru_init(jax.random.key(seed), d_in, d_m)
        x, mask, scale = _inputs(B=B, T=T, d_in=d_in, seed=seed + 17)
        m = mask if use_mask else None
        a = scale if use_scale else None

        def loss(seq_fn, p, xs):
            h, hT = seq_fn(p, xs, mask=m, gate_scale=a)
            return jnp.sum(jnp.sin(h)) + jnp.sum(hT ** 2)

        (l1, g1) = jax.value_and_grad(
            lambda p, xs: loss(gru_sequence, p, xs),
            argnums=(0, 1))(params, x)
        (l2, g2) = jax.value_and_grad(
            lambda p, xs: loss(pg.pallas_gru_sequence, p, xs),
            argnums=(0, 1))(params, x)
        chex.assert_trees_all_close(l1, l2, atol=1e-5)
        chex.assert_trees_all_close(g1, g2, atol=1e-4)
    finally:
        pg._INTERPRET = False


@pytest.mark.heavy
@settings(max_examples=24, deadline=None)
@given(B=st.integers(1, 6), T=st.integers(1, 20),
       d_in=st.sampled_from([2, 6]), d_m=st.sampled_from([3, 8]),
       seed=st.integers(0, 5))
def test_bf16_kernel_tracks_f32_oracle_property(B, T, d_in, d_m, seed):
    """The bf16 VPU-chain variant tracks the f32 oracle within bf16
    rounding amplified through the recurrence (random shapes)."""
    pg._INTERPRET = True
    try:
        params = gru_init(jax.random.key(seed), d_in, d_m)
        x, _, _ = _inputs(B=B, T=T, d_in=d_in, seed=seed + 31)
        h1, hT1 = gru_sequence(params, x)
        h2_tm, hT2 = pg.pallas_gru_sequence_tm(
            params, jnp.moveaxis(x, 0, 1), dtype=jnp.bfloat16)
        # |h| <= 1 (GRU state is a convex blend of tanh outputs):
        # absolute tolerance ~ bf16 eps * sqrt(T) accumulation
        chex.assert_trees_all_close(
            np.asarray(h2_tm, np.float32), np.asarray(
                jnp.moveaxis(h1, 0, 1), np.float32), atol=0.06)
        chex.assert_trees_all_close(np.asarray(hT2, np.float32),
                                    np.asarray(hT1, np.float32), atol=0.06)
    finally:
        pg._INTERPRET = False


@pytest.mark.heavy
@settings(max_examples=24, deadline=None)
@given(B=st.integers(1, 6), T=st.integers(2, 24), period=st.integers(2, 5),
       d_in=st.sampled_from([2, 6]), d_m=st.sampled_from([3, 8]),
       seed=st.integers(0, 5))
def test_stride_kernel_matches_dense_property(B, T, period, d_in, d_m,
                                              seed):
    """Strided-output variant == dense kernel's period-strided rows
    (bit-exact contract) over random (T, period) incl. T % period != 0."""
    pg._INTERPRET = True
    try:
        params = gru_init(jax.random.key(seed), d_in, d_m)
        x, _, _ = _inputs(B=B, T=T, d_in=d_in, seed=seed + 43)
        x_tm = jnp.moveaxis(x, 0, 1)
        h_dense, hT_dense = pg.pallas_gru_sequence_tm(params, x_tm)
        h_str, hT_str = pg.pallas_gru_stride_tm(params, x_tm, period)
        chex.assert_trees_all_close(h_str, h_dense[period - 1::period],
                                    atol=1e-6)
        chex.assert_trees_all_close(hT_str, hT_dense, atol=1e-6)
    finally:
        pg._INTERPRET = False


@pytest.mark.heavy
def test_hpmn_tm_encoder_matches_oracle():
    T, L, period, d_in, d_m, B = 20, 3, 2, 6, 5, 4
    params = init_hpmn(jax.random.key(3), d_in, d_m, L)
    x, mask, _ = _inputs(B=B, T=T, d_in=d_in, seed=4)
    mo = encode_oracle(params, x, mask, period)
    mt = encode_hierarchical_tm(
        params, jnp.moveaxis(x, 0, 1), mask.T, period,
        gru_seq_tm_fn=pg.pallas_gru_sequence_tm)
    chex.assert_trees_all_close(mo, mt, atol=1e-5)
    # full-mask static path (mask_tm=None)
    full = jnp.ones_like(mask)
    mo2 = encode_oracle(params, x, full, period)
    mt2 = encode_hierarchical_tm(
        params, jnp.moveaxis(x, 0, 1), None, period,
        gru_seq_tm_fn=pg.pallas_gru_sequence_tm)
    chex.assert_trees_all_close(mo2, mt2, atol=1e-5)


@pytest.mark.heavy
def test_readout_kernel_matches_oracle():
    B, L, d_m, dq, A = 8, 4, 6, 10, 7
    params = init_readout(jax.random.key(5), d_m, dq, A)
    mem = jax.random.normal(jax.random.key(6), (B, L, d_m))
    q = jax.random.normal(jax.random.key(7), (B, dq))
    r1 = attention_readout(params, mem, q)
    r2 = pr.pallas_attention_readout(params, mem, q)
    chex.assert_trees_all_close(r1, r2, atol=1e-5)
    # gradients (bwd runs through the jnp oracle's vjp)
    g1 = jax.grad(lambda m: jnp.sum(attention_readout(params, m, q) ** 2))(mem)
    g2 = jax.grad(lambda m: jnp.sum(
        pr.pallas_attention_readout(params, m, q) ** 2))(mem)
    chex.assert_trees_all_close(g1, g2, atol=1e-4)


@pytest.mark.parametrize("config,name", [
    ("taobao_hpmn", "hpmn"), ("taobao_dien", "dien"),
    ("amazon_gru4rec", "gru4rec")])
@pytest.mark.heavy
def test_full_model_pallas_path(config, name):
    """End-to-end loss/grad with use_pallas (time-major fused path) matches
    the XLA path for every encoder that has one."""
    cfg = get_config(config)
    batch = to_device_arrays(dummy_batch(8, 24, 300, 30, seed=9))
    params = init_model(jax.random.key(0), cfg, 300, 30)
    cfg.model.use_pallas = False
    (l1, _), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params, cfg, batch)
    cfg.model.use_pallas = True
    (l2, _), g2 = jax.value_and_grad(loss_fn, has_aux=True)(params, cfg, batch)
    assert abs(float(l1) - float(l2)) < 1e-4, name
    chex.assert_trees_all_close(g1, g2, atol=5e-3, rtol=1e-3)


@pytest.mark.parametrize("T,period", [(18, 3), (19, 3), (8, 4), (23, 5),
                                      (5, 10)])
def test_stride_kernel_matches_dense(T, period):
    """Strided-output kernel == dense kernel's stride-sampled h_seq and h_T,
    values AND grads (incl. the h_T cotangent and T % chunk != 0 padding)."""
    B, d_in, d_m = 8, 6, 4
    params = gru_init(jax.random.key(0), d_in, d_m)
    x_tm = jax.random.normal(jax.random.key(1), (T, B, d_in))

    def dense(x):
        hseq, hT = pg.pallas_gru_sequence_tm(params, x)
        return hseq[period - 1::period], hT

    def stride(x):
        return pg.pallas_gru_stride_tm(params, x, period)

    hs_d, hT_d = dense(x_tm)
    hs_s, hT_s = stride(x_tm)
    chex.assert_trees_all_close(hs_s, hs_d, atol=1e-6)
    chex.assert_trees_all_close(hT_s, hT_d, atol=1e-6)

    # grads through both cotangent paths
    k1, k2 = jax.random.split(jax.random.key(2))
    g_hs = jax.random.normal(k1, hs_d.shape)
    g_hT = jax.random.normal(k2, hT_d.shape)

    def loss(f, x):
        hs, hT = f(x)
        return jnp.sum(hs * g_hs) + jnp.sum(hT * g_hT)

    gx_d = jax.grad(lambda x: loss(dense, x))(x_tm)
    gx_s = jax.grad(lambda x: loss(stride, x))(x_tm)
    chex.assert_trees_all_close(gx_s, gx_d, atol=1e-5)


def test_stride_kernel_weight_grads():
    """Weight/bias gradients of the strided kernel == the jnp oracle's."""
    from hpmn_tpu.ops.gru import gru_sequence

    B, T, d_in, d_m, period = 4, 19, 6, 4, 3
    params = gru_init(jax.random.key(0), d_in, d_m)
    x = jax.random.normal(jax.random.key(1), (B, T, d_in))
    x_tm = jnp.moveaxis(x, 0, 1)
    S = T // period
    g_hs = jax.random.normal(jax.random.key(2), (S, B, d_m))
    g_hT = jax.random.normal(jax.random.key(3), (B, d_m))

    def loss_stride(p):
        hs, hT = pg.pallas_gru_stride_tm(p, x_tm, period)
        return jnp.sum(hs * g_hs) + jnp.sum(hT * g_hT)

    def loss_oracle(p):
        hseq, hT = gru_sequence(p, x)  # batch-major [B, T, dm]
        hs = jnp.moveaxis(hseq, 0, 1)[period - 1::period]
        return jnp.sum(hs * g_hs) + jnp.sum(hT * g_hT)

    g_s = jax.grad(loss_stride)(params)
    g_o = jax.grad(loss_oracle)(params)
    chex.assert_trees_all_close(g_s, g_o, atol=1e-5)


def test_hpmn_stride_path_matches_oracle():
    """Full HPMN encoder on the strided-output path == masked-scan oracle
    (full-length sequences)."""
    from hpmn_tpu.models.hpmn import encode_hierarchical_stride_tm

    B, T, d_in, d_m, L, period = 8, 25, 6, 4, 3, 3
    params = init_hpmn(jax.random.key(0), d_in, d_m, L)
    x = jax.random.normal(jax.random.key(1), (B, T, d_in))
    full = jnp.ones((B, T))

    mem_oracle = encode_oracle(params, x, full, period)
    mem_stride = encode_hierarchical_stride_tm(
        params, jnp.moveaxis(x, 0, 1), period,
        stride_fn=pg.pallas_gru_stride_tm)
    chex.assert_trees_all_close(mem_stride, mem_oracle, atol=1e-5)

    # gradients through the whole encoder
    g = jax.random.normal(jax.random.key(2), mem_oracle.shape)
    go = jax.grad(lambda p: jnp.sum(
        encode_oracle(p, x, full, period) * g))(params)
    gs = jax.grad(lambda p: jnp.sum(encode_hierarchical_stride_tm(
        p, jnp.moveaxis(x, 0, 1), period,
        stride_fn=pg.pallas_gru_stride_tm) * g))(params)
    chex.assert_trees_all_close(gs, go, atol=2e-5)


def test_full_model_stride_path():
    """xlong_hpmn flagship flags (stride outputs + full-mask) == oracle."""
    cfg = get_config("xlong_hpmn")
    cfg.model.hpmn_layers = 3
    spec_T, n_items, n_cats = 30, 200, 20
    batch = to_device_arrays(dummy_batch(8, spec_T, n_items, n_cats, seed=3))
    batch = batch.__class__(**{**batch.__dict__,
                               "seq_mask": jnp.ones_like(batch.seq_mask)})
    params = init_model(jax.random.key(0), cfg, n_items, n_cats)

    cfg.model.use_pallas = False
    cfg.model.use_hierarchical_scan = False
    loss_o, grads_o = jax.value_and_grad(
        lambda p: loss_fn(p, cfg, batch)[0])(params)

    cfg.model.use_pallas = True
    cfg.model.use_hierarchical_scan = True
    cfg.model.assume_full_mask = True
    cfg.model.pallas_stride_outputs = True  # the non-default variant
    loss_s, grads_s = jax.value_and_grad(
        lambda p: loss_fn(p, cfg, batch)[0])(params)

    chex.assert_trees_all_close(loss_s, loss_o, atol=1e-5)
    chex.assert_trees_all_close(grads_s, grads_o, atol=3e-4)
