"""Sequence parallelism: the T-sharded pipelined scan must equal the plain
scan (values AND grads), and the (data, seq) train step must equal the
single-device step. SURVEY.md §2.3 SP row."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from hypothesis import given, settings, strategies as st
from jax.sharding import PartitionSpec as P

from hpmn_tpu.configs import get_config
from hpmn_tpu.data.schema import dummy_batch, to_device_arrays
from hpmn_tpu.models import apply_model, init_model, loss_fn
from hpmn_tpu.ops.gru import gru_init, gru_sequence
from hpmn_tpu.parallel.seq_parallel import (SEQ_AXIS, make_sp_mesh,
                                            make_sp_steps, sp_gru_sequence)

N_ITEMS, N_CATS = 96, 24


def _data(seed, B, T, d_in, masked=True, scaled=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, d_in)), jnp.float32)
    if masked:  # left-padded: first pad_b steps invalid
        pads = rng.integers(0, T, size=B)
        mask = jnp.asarray(np.arange(T)[None, :] >= pads[:, None],
                           jnp.float32)
    else:
        mask = jnp.ones((B, T), jnp.float32)
    scale = (jnp.asarray(rng.uniform(0.1, 1.0, size=(B, T)), jnp.float32)
             if scaled else None)
    return x, mask, scale


def _sp_shardmapped(params, x, mask, scale, n_seq, mb):
    mesh = make_sp_mesh(seq_parallel=n_seq, devices=jax.devices()[:n_seq])

    def f(p, xs, m, a):
        return sp_gru_sequence(p, xs, mask=m, gate_scale=a, n_shards=n_seq,
                               microbatches=mb)

    specs = (P(), P(), P(), P() if scale is None else P())
    fn = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=specs,
                               out_specs=(P(), P()), check_vma=False))
    return fn(params, x, mask, scale if scale is not None
              else jnp.ones_like(mask))


@pytest.mark.parametrize("mb,masked,scaled", [(1, True, False),
                                              (4, True, False),
                                              (8, False, False),
                                              (4, True, True)])
def test_sp_scan_matches_plain(mb, masked, scaled):
    B, T, d_in, d_m, n_seq = 8, 24, 6, 5, 4
    params = gru_init(jax.random.key(0), d_in, d_m)
    x, mask, scale = _data(3, B, T, d_in, masked, scaled)
    h_ref, hT_ref = gru_sequence(params, x, mask=mask, gate_scale=scale)
    h_sp, hT_sp = _sp_shardmapped(params, x, mask, scale, n_seq, mb)
    chex.assert_trees_all_close(np.asarray(h_sp), np.asarray(h_ref),
                                atol=1e-6)
    chex.assert_trees_all_close(np.asarray(hT_sp), np.asarray(hT_ref),
                                atol=1e-6)


def test_sp_scan_fallback_when_indivisible():
    """T % n_seq != 0 -> replicated local scan, still exact."""
    B, T, d_in, d_m, n_seq = 4, 10, 3, 4, 4
    params = gru_init(jax.random.key(1), d_in, d_m)
    x, mask, _ = _data(7, B, T, d_in)
    h_ref, hT_ref = gru_sequence(params, x, mask=mask)
    h_sp, hT_sp = _sp_shardmapped(params, x, mask, None, n_seq, 2)
    chex.assert_trees_all_close(np.asarray(h_sp), np.asarray(h_ref),
                                atol=1e-6)
    chex.assert_trees_all_close(np.asarray(hT_sp), np.asarray(hT_ref),
                                atol=1e-6)


@pytest.mark.heavy
@settings(max_examples=40, deadline=None)
@given(B=st.integers(1, 6), T=st.integers(1, 32),
       n_seq=st.sampled_from([2, 4, 8]), mb=st.integers(1, 6),
       masked=st.booleans(), scaled=st.booleans(), seed=st.integers(0, 5))
def test_sp_schedule_property(B, T, n_seq, mb, masked, scaled, seed):
    """Randomized (T, n_shards, microbatches) sweep of the pipelined
    schedule (VERDICT r2 weak #5), incl. indivisible T (local fallback)
    and every mask/gate-scale combination."""
    d_in, d_m = 5, 4
    params = gru_init(jax.random.key(seed), d_in, d_m)
    x, mask, scale = _data(seed + 13, B, T, d_in, masked, scaled)
    h_ref, hT_ref = gru_sequence(params, x, mask=mask, gate_scale=scale)
    h_sp, hT_sp = _sp_shardmapped(params, x, mask, scale, n_seq, mb)
    chex.assert_trees_all_close(np.asarray(h_sp), np.asarray(h_ref),
                                atol=1e-5)
    chex.assert_trees_all_close(np.asarray(hT_sp), np.asarray(hT_ref),
                                atol=1e-5)


def test_sp_scan_grads_match_plain():
    """Grads wrt params AND inputs through the pipelined collectives, with
    the pmean-over-seq convention of make_sp_steps."""
    B, T, d_in, d_m, n_seq, mb = 8, 16, 6, 5, 4, 4
    params = gru_init(jax.random.key(2), d_in, d_m)
    x, mask, _ = _data(11, B, T, d_in)
    mesh = make_sp_mesh(seq_parallel=n_seq, devices=jax.devices()[:n_seq])

    def loss_ref(p, xs):
        h, hT = gru_sequence(p, xs, mask=mask)
        return jnp.sum(h ** 2) + jnp.sum(hT ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)

    def loss_sp(p, xs):
        h, hT = sp_gru_sequence(p, xs, mask=mask, n_shards=n_seq,
                                microbatches=mb)
        return jnp.sum(h ** 2) + jnp.sum(hT ** 2)

    def shard_grads(p, xs):
        g = jax.grad(loss_sp, argnums=(0, 1))(p, xs)
        return jax.tree.map(lambda a: jax.lax.pmean(a, SEQ_AXIS), g)

    fn = jax.jit(jax.shard_map(shard_grads, mesh=mesh, in_specs=(P(), P()),
                               out_specs=(P(), P()), check_vma=False))
    g_sp = fn(params, x)
    chex.assert_trees_all_close(jax.device_get(g_sp), jax.device_get(g_ref),
                                atol=2e-5, rtol=2e-5)


@pytest.mark.heavy
@pytest.mark.parametrize("model", ["hpmn", "dien"])
def test_sp_train_step_matches_single_device(model):
    """Full (data=2, seq=4) training step == single-device step: params
    after one SGD update and eval logits agree."""
    mesh = make_sp_mesh(seq_parallel=4, devices=jax.devices()[:8])
    cfg = get_config("amazon_hpmn" if model == "hpmn" else "taobao_dien")
    cfg.model.name = model
    cfg.model.use_pallas = False
    cfg.model.hpmn_layers = 2
    cfg.mesh.embedding_mode = "replicated"
    cfg.train.steps_per_dispatch = 1
    T = 16  # n_seq | T so layer 1 really pipelines
    batch = to_device_arrays(dummy_batch(8, T, N_ITEMS, N_CATS, seed=9))
    tx = optax.sgd(1e-2)

    params0 = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    (_, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params0, cfg,
                                                           batch)
    u0, _ = tx.update(g0, tx.init(params0), params0)
    p_ref = optax.apply_updates(params0, u0)

    jit_train, jit_eval = make_sp_steps(cfg, tx, mesh)
    opt_state = tx.init(params0)
    step = jit_train(params0, opt_state)
    with mesh:
        p2, _, metrics = step(params0, opt_state, batch)
    chex.assert_trees_all_close(jax.device_get(p2), jax.device_get(p_ref),
                                atol=2e-5)
    assert np.isfinite(float(metrics["loss"]))

    logits_ref, _ = apply_model(p_ref, cfg, batch)
    with mesh:
        logits = jit_eval(p2)(p2, batch)
    chex.assert_trees_all_close(np.asarray(jax.device_get(logits)),
                                np.asarray(logits_ref), atol=1e-4)


@pytest.mark.heavy
def test_sp_train_step_pallas_inner_matches_single_device():
    """mesh.sp_inner='pallas': the fused kernel as the SP chunk scan
    (interpret mode on CPU) — step == single-device jnp step."""
    import hpmn_tpu.ops.pallas_gru as pg

    pg._INTERPRET = True
    try:
        mesh = make_sp_mesh(seq_parallel=4, devices=jax.devices()[:4])
        cfg = get_config("amazon_hpmn")
        cfg.train.steps_per_dispatch = 1  # single-step test (config ships k=64)
        cfg.model.use_pallas = False
        cfg.model.hpmn_layers = 2
        cfg.mesh.embedding_mode = "replicated"
        cfg.mesh.sp_inner = "pallas"
        cfg.mesh.sp_min_local_steps = 4
        batch = to_device_arrays(dummy_batch(8, 16, N_ITEMS, N_CATS, seed=2))
        tx = optax.sgd(1e-2)
        params0 = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
        (_, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params0, cfg,
                                                               batch)
        u0, _ = tx.update(g0, tx.init(params0), params0)
        p_ref = optax.apply_updates(params0, u0)

        jit_train, _ = make_sp_steps(cfg, tx, mesh)
        step = jit_train(params0, tx.init(params0))
        with mesh:
            p2, _, m = step(params0, tx.init(params0), batch)
        chex.assert_trees_all_close(jax.device_get(p2),
                                    jax.device_get(p_ref), atol=2e-5)
        assert np.isfinite(float(m["loss"]))
    finally:
        pg._INTERPRET = False


@pytest.mark.heavy
@pytest.mark.parametrize("emode,sp_inner,bom",
                         [("psum", "jnp", False), ("a2a", "jnp", False),
                          ("psum", "pallas", False),
                          ("a2a", "pallas", True)])
def test_composed_dp_sp_tp_step_matches_single_device(emode, sp_inner, bom):
    """The full DP x SP x TP composition: (data=2, seq=2, model=2) mesh
    through make_shardmap_steps — row-sharded tables with collective
    lookup, T-sharded layer scans, psum-DP — equals the single-device
    step. The 'pallas' legs run the fused kernel (interpret mode) as the
    SP chunk scan — the 3-axis x kernel configuration a pod run would
    ship (VERDICT r3 weak #2); the bom leg adds batch_over_model + the
    bucketed a2a exchange on top — every parallel feature at once."""
    import hpmn_tpu.ops.pallas_gru as pg

    from hpmn_tpu.parallel import (init_sharded_model, make_mesh,
                                   make_shardmap_steps, pad_vocab,
                                   param_shardings, shard_batch)

    if sp_inner == "pallas":
        pg._INTERPRET = True
    try:
        ni, nc = pad_vocab(96, 2), pad_vocab(24, 2)
        mesh = make_mesh(model_parallel=2, seq_parallel=2,
                         devices=jax.devices()[:8])
        cfg = get_config("amazon_hpmn")
        cfg.train.steps_per_dispatch = 1  # single-step (config ships k=64)
        cfg.model.use_pallas = False
        cfg.model.hpmn_layers = 2
        cfg.mesh.embedding_mode = emode
        cfg.mesh.sp_inner = sp_inner
        cfg.mesh.sp_min_local_steps = 4
        cfg.mesh.batch_over_model = bom
        over = ("data", "model") if bom else ("data",)
        batch = to_device_arrays(dummy_batch(8, 16, ni, nc, seed=4))
        tx = optax.sgd(1e-2)

        params0 = init_model(jax.random.key(0), cfg, ni, nc)
        (_, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params0, cfg,
                                                               batch)
        u0, _ = tx.update(g0, tx.init(params0), params0)
        p_ref = optax.apply_updates(params0, u0)

        params = init_sharded_model(jax.random.key(0), cfg, ni, nc, mesh)
        opt_state = jax.device_put(tx.init(params),
                                   param_shardings(mesh, tx.init(params)))
        jit_train, jit_eval = make_shardmap_steps(cfg, tx, mesh)
        step = jit_train(params, opt_state)
        sbatch = shard_batch(mesh, batch, over=over)
        p2, _, metrics = step(params, opt_state, sbatch)
        chex.assert_trees_all_close(jax.device_get(p2),
                                    jax.device_get(p_ref), atol=2e-5)
        assert np.isfinite(float(metrics["loss"]))
        logits_ref, _ = apply_model(p_ref, cfg, batch)
        logits = jit_eval(p2)(p2, sbatch)
        chex.assert_trees_all_close(np.asarray(jax.device_get(logits)),
                                    np.asarray(logits_ref), atol=1e-4)
    finally:
        pg._INTERPRET = False


@pytest.mark.heavy
def test_train_driver_routes_seq_parallel():
    """cfg.mesh.seq_parallel > 1 routes the driver through make_sp_steps
    end to end (T=100 splits 4 ways; amazon config is CPU-runnable)."""
    from hpmn_tpu.train.train import train

    cfg = get_config("amazon_hpmn")
    cfg.train.steps_per_dispatch = 1  # single-step test (config ships k=64)
    cfg.eval_steps_per_dispatch = 1  # pin (config ships auto)
    cfg.n_examples = 1200
    cfg.train.batch_size = 64
    cfg.train.max_steps = 30
    cfg.train.eval_every = 15
    cfg.train.log_every = 1000
    cfg.mesh.seq_parallel = 4
    res = train(cfg, log=lambda s: None)
    assert np.isfinite(res["test"]["log_loss"])
    assert 0.0 <= res["best_val_auc"] <= 1.0


@pytest.mark.heavy
def test_sp_multistep_matches_sequential():
    """SP path with steps_per_dispatch=2 == two sequential k=1 dispatches
    (same collectives per step, fused via lax.scan)."""
    import jax.numpy as jnp

    mesh = make_sp_mesh(seq_parallel=4, devices=jax.devices()[:4])
    cfg = get_config("amazon_hpmn")
    cfg.train.steps_per_dispatch = 1  # single-step test (config ships k=64)
    cfg.model.use_pallas = False
    cfg.model.hpmn_layers = 2
    cfg.mesh.embedding_mode = "replicated"
    tx = optax.sgd(1e-2)
    batches = [to_device_arrays(dummy_batch(8, 16, N_ITEMS, N_CATS, seed=s))
               for s in (0, 1)]
    params0 = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)

    cfg.train.steps_per_dispatch = 1
    jit1, _ = make_sp_steps(cfg, tx, mesh)
    step1 = jit1(params0, tx.init(params0))
    p, o = params0, tx.init(params0)
    with mesh:
        for b in batches:
            p, o, _ = step1(p, o, b)

    cfg.train.steps_per_dispatch = 2
    jit2, _ = make_sp_steps(cfg, tx, mesh)
    step2 = jit2(params0, tx.init(params0))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    with mesh:
        p2, _, _ = step2(params0, tx.init(params0), stacked)
    chex.assert_trees_all_close(jax.device_get(p2), jax.device_get(p),
                                atol=1e-6)


def test_make_sp_steps_guards():
    mesh = make_sp_mesh(seq_parallel=2, devices=jax.devices()[:2])
    cfg = get_config("amazon_hpmn")
    cfg.train.steps_per_dispatch = 1  # single-step test (config ships k=64)
    cfg.mesh.embedding_mode = "psum"
    with pytest.raises(ValueError, match="replicated"):
        make_sp_steps(cfg, optax.sgd(1e-2), mesh)
    cfg.mesh.embedding_mode = "replicated"
    cfg.model.use_pallas = True
    with pytest.raises(ValueError, match="use_pallas"):
        make_sp_steps(cfg, optax.sgd(1e-2), mesh)
