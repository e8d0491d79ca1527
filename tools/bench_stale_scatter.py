"""VERDICT r3 next #8: can stale-by-one table gradients buy back the
embedding-scatter wall?

The item-table gradient scatter is measured at XLA's platform floor
(ARCHITECTURE §4: every route through "write 512k rows at dynamic HBM
addresses" costs >= 7.4 ms). The remaining candidate lever is algorithmic:
inside the k-chained scan, apply step i's TABLE gradients during step i+1
(dense params update on time), so the scatter of step i is no longer on
the dependence path between step i's backward and step i+1's forward —
IF the hardware can overlap it with anything.

This tool measures exactly that: the standard fused multistep
(train.steps_per_dispatch idiom) vs a variant whose scan carry threads the
pending table gradients one step behind. Math note: within a dispatch the
table sees each gradient one step late and the last step's table gradient
carries into the NEXT dispatch's first update (threaded through the
harness), so steady-state training math is "every table grad applied,
one step stale" — the quality question only matters if the throughput
moves, which is what this measures first (the TPU core executes HLOs
serially; overlap would have to come from async DMA the scheduler finds).

One JSON line: {"metric": "stale_scatter", "baseline_ex_s": ...,
"stale_ex_s": ..., "speedup": ...}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402


def _is_table(path, leaf):
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    return "embedding" in keys and getattr(leaf, "ndim", 0) == 2


def make_stale_multistep(cfg, tx):
    """fuse_steps variant: table grads applied one step late; pending table
    grads ride the carry and are returned so the caller threads them into
    the next dispatch."""
    from hpmn_tpu.models import loss_fn

    def step(carry, batch):
        params, opt_state, pending = carry
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, batch)
        del metrics["logits"]
        g_eff = jax.tree_util.tree_map_with_path(
            lambda p, g, pend: pend if _is_table(p, g) else g,
            grads, pending)
        updates, opt_state = tx.update(g_eff, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_pending = jax.tree_util.tree_map_with_path(
            lambda p, g, pend: g if _is_table(p, g) else pend,
            grads, pending)
        return (params, opt_state, new_pending), metrics

    def multistep(params, opt_state, pending, batches):
        (params, opt_state, pending), ms = jax.lax.scan(
            step, (params, opt_state, pending), batches)
        return params, opt_state, pending, jax.tree.map(lambda x: x[-1], ms)

    return jax.jit(multistep)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="xlong_hpmn")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--n_dispatch", type=int, default=3)
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench

    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data.synthetic import SPECS
    from hpmn_tpu.models import init_model, loss_fn

    cfg = get_config(args.config)
    spec = SPECS[cfg.dataset]
    if not args.force_cpu:
        # flagship flags — the shape whose scatter wall this attacks
        # (CPU = smoke-test mode: compiled Pallas is TPU-only)
        cfg.model.use_pallas = True
        cfg.model.scan_dtype = "bfloat16"
        cfg.model.assume_full_mask = True
    batches = bench._make_batches(cfg, spec, 4, cfg.train.batch_size)
    params = init_model(jax.random.key(0), cfg, spec.n_items, spec.n_cats)

    base = bench._bench_train_step(cfg, params, batches,
                                   n_dispatch=args.n_dispatch, k=args.k)

    tx = optax.adam(cfg.train.lr)
    opt_state = tx.init(params)
    step = make_stale_multistep(cfg, tx)
    k = args.k
    stacks = [jax.tree.map(lambda *xs: jnp.stack(xs), *[
        batches[(i + j) % len(batches)] for j in range(k)])
        for i in range(len(batches))]
    (_, _), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batches[0])
    pending = jax.tree_util.tree_map_with_path(
        lambda p, g: g if _is_table(p, g) else jnp.zeros_like(g), g0)
    p, o = params, opt_state
    for i in range(2):  # warmup/compile
        p, o, pending, m = step(p, o, pending, stacks[i % len(stacks)])
    float(m["loss"])
    t0 = time.time()
    for i in range(args.n_dispatch):
        p, o, pending, m = step(p, o, pending, stacks[i % len(stacks)])
    float(m["loss"])
    dt = (time.time() - t0) / (args.n_dispatch * k)
    stale = cfg.train.batch_size / dt

    print(json.dumps({"metric": "stale_scatter", "config": args.config,
                      "k": k, "baseline_ex_s": round(base, 1),
                      "stale_ex_s": round(stale, 1),
                      "speedup": round(stale / base, 3)}))


if __name__ == "__main__":
    main()
