"""shard_map train step == single-device step — including with the Pallas
kernels (interpret mode), the path GSPMD cannot partition."""

import chex
import jax
import numpy as np
import optax
import pytest

import hpmn_tpu.ops.pallas_gru as pg
import hpmn_tpu.ops.pallas_readout as pr
from hpmn_tpu.configs import get_config
from hpmn_tpu.data.schema import dummy_batch, to_device_arrays
from hpmn_tpu.models import init_model, loss_fn
from hpmn_tpu.parallel import (init_sharded_model, make_mesh,
                               make_shardmap_steps, pad_vocab,
                               param_shardings, shard_batch)

N_ITEMS, N_CATS = pad_vocab(96, 4), pad_vocab(24, 4)


def _single_device_reference(cfg, batch, tx):
    params0 = init_model(jax.random.key(0), cfg, N_ITEMS, N_CATS)
    (_, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params0, cfg,
                                                           batch)
    u0, _ = tx.update(g0, tx.init(params0), params0)
    return optax.apply_updates(params0, u0)


@pytest.mark.heavy
@pytest.mark.parametrize("use_pallas", [False, True])
def test_shardmap_step_matches_single_device(use_pallas):
    if use_pallas:
        pg._INTERPRET = True
        pr._INTERPRET = True
    try:
        mesh = make_mesh(model_parallel=4, devices=jax.devices()[:8])
        cfg = get_config("amazon_hpmn")
        cfg.train.steps_per_dispatch = 1  # single-step test (config ships k=64)
        cfg.model.hpmn_layers = 2
        cfg.model.use_pallas = use_pallas
        cfg.mesh.embedding_mode = "psum"
        batch = to_device_arrays(dummy_batch(8, 12, N_ITEMS, N_CATS, seed=5))
        # SGD, not Adam: Adam's first-step update is ~sign(g)*lr, so psum
        # reduction-order noise on near-zero grads flips update signs; SGD
        # keeps updates proportional to grads and the comparison meaningful.
        tx = optax.sgd(1e-2)
        p_ref = _single_device_reference(cfg, batch, tx)

        params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS,
                                    mesh)
        opt_state = jax.device_put(tx.init(params),
                                   param_shardings(mesh, tx.init(params)))
        jit_train, jit_eval = make_shardmap_steps(cfg, tx, mesh)
        step = jit_train(params, opt_state)
        p2, o2, metrics = step(params, opt_state, shard_batch(mesh, batch))
        chex.assert_trees_all_close(jax.device_get(p2),
                                    jax.device_get(p_ref), atol=2e-5)
        assert np.isfinite(float(metrics["loss"]))
        # eval parity
        from hpmn_tpu.models import apply_model
        logits_ref, _ = apply_model(p_ref, cfg, batch)
        logits = jit_eval(p2)(p2, shard_batch(mesh, batch))
        chex.assert_trees_all_close(np.asarray(jax.device_get(logits)),
                                    np.asarray(logits_ref), atol=1e-3)
    finally:
        pg._INTERPRET = False
        pr._INTERPRET = False


def test_shardmap_multistep_matches_sequential():
    """shard_map path with steps_per_dispatch=2 == two sequential k=1
    dispatches (exact: same collectives, same order per step)."""
    import jax.numpy as jnp

    mesh = make_mesh(model_parallel=2, devices=jax.devices()[:4])
    cfg = get_config("amazon_hpmn")
    cfg.train.steps_per_dispatch = 1  # single-step test (config ships k=64)
    cfg.model.hpmn_layers = 2
    cfg.mesh.embedding_mode = "psum"
    tx = optax.sgd(1e-2)
    batches = [to_device_arrays(dummy_batch(8, 12, N_ITEMS, N_CATS, seed=s))
               for s in (1, 2)]

    params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS, mesh)
    opt0 = jax.device_put(tx.init(params),
                          param_shardings(mesh, tx.init(params)))

    cfg.train.steps_per_dispatch = 1
    step1 = make_shardmap_steps(cfg, tx, mesh)[0](params, opt0)
    p_seq, o_seq = params, opt0
    for b in batches:
        p_seq, o_seq, m_seq = step1(p_seq, o_seq, shard_batch(mesh, b))

    cfg.train.steps_per_dispatch = 2
    stepk = make_shardmap_steps(cfg, tx, mesh)[0](params, opt0)
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    p_k, o_k, m_k = stepk(params, opt0, shard_batch(mesh, stack, stacked=True))

    chex.assert_trees_all_close(jax.device_get(p_seq), jax.device_get(p_k),
                                atol=1e-6)
    chex.assert_trees_all_close(m_seq["loss"], m_k["loss"], atol=1e-6)


def test_gspmd_multistep_matches_sequential():
    """GSPMD path with steps_per_dispatch=2 == two sequential dispatches."""
    import jax.numpy as jnp

    from hpmn_tpu.parallel import make_sharded_steps

    mesh = make_mesh(model_parallel=1, devices=jax.devices()[:4])
    cfg = get_config("amazon_hpmn")
    cfg.train.steps_per_dispatch = 1  # single-step test (config ships k=64)
    cfg.model.hpmn_layers = 2
    tx = optax.sgd(1e-2)
    batches = [to_device_arrays(dummy_batch(8, 12, N_ITEMS, N_CATS, seed=s))
               for s in (3, 4)]

    params = init_sharded_model(jax.random.key(0), cfg, N_ITEMS, N_CATS, mesh)
    opt0 = jax.device_put(tx.init(params),
                          param_shardings(mesh, tx.init(params)))

    cfg.train.steps_per_dispatch = 1
    step1 = make_sharded_steps(cfg, tx, mesh)[0](params, opt0)
    # GSPMD step donates params/opt buffers: thread copies
    p_seq, o_seq = jax.tree.map(jnp.copy, (params, opt0))
    for b in batches:
        p_seq, o_seq, m_seq = step1(p_seq, o_seq, shard_batch(mesh, b))

    cfg.train.steps_per_dispatch = 2
    stepk = make_sharded_steps(cfg, tx, mesh)[0](params, opt0)
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    p_k, o_k, m_k = stepk(params, opt0, shard_batch(mesh, stack, stacked=True))

    chex.assert_trees_all_close(jax.device_get(p_seq), jax.device_get(p_k),
                                atol=1e-6)
    chex.assert_trees_all_close(m_seq["loss"], m_k["loss"], atol=1e-6)
