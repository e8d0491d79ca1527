"""Data-parallel scaling harness: sharded train step at mesh sizes 1/2/4/8.

BASELINE.json:5 demands >=90% scaling efficiency 1 -> N hosts; this
environment has one chip, so real scaling is unmeasurable (VERDICT r1
missing #4). This harness is the measurement that runs THE MOMENT >=2 real
devices/hosts exist, and meanwhile exercises the identical code path on a
virtual CPU mesh (`--xla_force_host_platform_device_count`) to keep the
harness itself green.

Per mesh size D it times the PRODUCTION shard_map training step
(`make_shardmap_steps` — the path train.py routes to for the flagship
Pallas config) on a global batch of D * per_device_batch examples, and
reports throughput plus efficiency vs. the 1-device run (weak scaling:
per-device work constant).

One JSON line:
  {"metric": "dp_weak_scaling", "platform": ..., "sizes": {"1": {...},
   "2": {"examples_per_sec": .., "efficiency": ..}, ...}}

CPU-mesh caveat (also BASELINE.md): virtual devices share one socket's
FLOPs, so CPU efficiency numbers are NOT the TPU prediction; the harness's
job here is correctness + shape of the measurement. On real multi-chip
hardware, drop --force_cpu and the same code produces the [B:5] table.

Usage:
  python tools/bench_scaling.py --force_cpu --sizes 1,2,4,8
  python tools/bench_scaling.py --sizes 1,4,8 --config xlong_hpmn  # real HW
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_size(d: int, cfg, per_device_batch: int, steps: int,
               use_pallas: bool, seq_parallel: int = 1,
               model_parallel: int = 1):
    bom = bool(getattr(cfg.mesh, "batch_over_model", False)) \
        and model_parallel > 1
    import jax
    import numpy as np
    import optax

    from hpmn_tpu.data.schema import batch_from_numpy, to_device_arrays
    from hpmn_tpu.data.synthetic import SPECS, make_ctr_dataset
    from hpmn_tpu.parallel import (init_sharded_model, make_mesh,
                                   make_shardmap_steps, param_shardings,
                                   shard_batch)

    spec = SPECS[cfg.dataset]
    mesh = make_mesh(model_parallel=model_parallel,
                     seq_parallel=seq_parallel, devices=jax.devices()[:d])
    n_data = d // (seq_parallel * model_parallel)
    # Weak scaling holds per-DATA-shard work constant; seq/model shards
    # cooperate on the same examples rather than adding more — EXCEPT
    # under batch_over_model, where model shards each carry their own
    # example slice (the bucketed-a2a regime, ARCHITECTURE §5).
    B = per_device_batch * n_data * (model_parallel if bom else 1)
    cfg.train.batch_size = B
    cfg.model.use_pallas = use_pallas

    n_batches = 3  # distinct batches: the axon relay dedups identical dispatches
    arrays = make_ctr_dataset(spec, n_batches * B, seed=0, min_len_frac=1.0)
    arrays["seq_mask"][:] = 1.0
    over = ("data", "model") if bom else ("data",)
    batches = [shard_batch(mesh, to_device_arrays(batch_from_numpy(
        arrays, np.arange(i * B, (i + 1) * B))), over=over)
        for i in range(n_batches)]

    params = init_sharded_model(jax.random.key(0), cfg, spec.n_items,
                                spec.n_cats, mesh)
    tx = optax.adam(cfg.train.lr)
    opt = jax.device_put(tx.init(params),
                         param_shardings(mesh, jax.eval_shape(tx.init, params)))
    jit_train, _ = make_shardmap_steps(cfg, tx, mesh)
    step = jit_train(params, opt)

    for i in range(2):
        params, opt, m = step(params, opt, batches[i % n_batches])
    float(m["loss"])  # scalar pull: block_until_ready lies over the tunnel
    t0 = time.time()
    for i in range(steps):
        params, opt, m = step(params, opt, batches[i % n_batches])
    float(m["loss"])
    dt = (time.time() - t0) / steps
    return B / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="xlong_hpmn")
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--per_device_batch", type=int, default=0,
                    help="0 = auto: 512 on TPU, 8 on CPU mesh")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--seq_parallel", type=int, default=1,
                    help="seq-axis size within each mesh size (SP legs)")
    ap.add_argument("--model_parallel", type=int, default=1,
                    help="model-axis size within each mesh size (TP legs)")
    ap.add_argument("--embedding_mode", default="",
                    help="psum | a2a (default: a2a when model_parallel>1 — "
                         "the shipped TP default; psum is the legacy leg)")
    ap.add_argument("--batch_over_model", action="store_true", default=None,
                    help="shard the batch over (data, model): the bucketed "
                         "a2a regime — requires a2a mode. Default: on when "
                         "model_parallel>1 with a2a (the shipped layout)")
    ap.add_argument("--force_cpu", action="store_true",
                    help="run on virtual CPU devices (harness validation)")
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",")]
    if args.force_cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(sizes)}")
    import jax
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides env

    from hpmn_tpu.configs import get_config

    platform = jax.devices()[0].platform
    is_cpu = platform == "cpu"
    pdb = args.per_device_batch or (8 if is_cpu else 512)
    cfg = get_config(args.config)
    cfg.train.steps_per_dispatch = 1  # this harness times single dispatches
    if is_cpu:
        # tiny shapes: the harness validates mechanics, not CPU FLOPs
        cfg.model.use_pallas = False

    n_dev = len(jax.devices())
    if args.seq_parallel > 1:
        cfg.mesh.seq_parallel = args.seq_parallel
        cfg.model.use_pallas = False  # seq axis owns gru_seq_fn
    if args.embedding_mode:
        cfg.mesh.embedding_mode = args.embedding_mode
    elif args.model_parallel > 1 and cfg.mesh.embedding_mode == "replicated":
        cfg.mesh.embedding_mode = "a2a"  # shipped TP default (r5)
    cfg.mesh.batch_over_model = (
        args.batch_over_model if args.batch_over_model is not None
        else args.model_parallel > 1 and cfg.mesh.embedding_mode == "a2a")
    out = {"metric": "dp_weak_scaling", "platform": platform,
           "config": args.config, "per_device_batch": pdb,
           "seq_parallel": args.seq_parallel,
           "model_parallel": args.model_parallel,
           "embedding_mode": cfg.mesh.embedding_mode,
           "batch_over_model": cfg.mesh.batch_over_model, "sizes": {}}
    base = None
    for d in sizes:
        if d > n_dev:
            print(f"# skipping size {d}: only {n_dev} devices", file=sys.stderr)
            continue
        if d % (args.seq_parallel * args.model_parallel):
            print(f"# skipping size {d}: not divisible by seq*model",
                  file=sys.stderr)
            continue
        ex_s = bench_size(d, cfg, pdb, args.steps,
                          use_pallas=not is_cpu and args.seq_parallel == 1,
                          seq_parallel=args.seq_parallel,
                          model_parallel=args.model_parallel)
        per_dev = ex_s / d
        if base is None:
            base = per_dev
        out["sizes"][str(d)] = {
            "examples_per_sec": round(ex_s, 1),
            "per_device": round(per_dev, 1),
            "efficiency": round(per_dev / base, 3),
        }
        print(f"# D={d}: {ex_s:,.0f} ex/s ({per_dev:,.0f}/dev, "
              f"eff {per_dev / base:.1%})", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
