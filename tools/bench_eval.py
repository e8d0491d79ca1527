"""Eval-loop wall time vs eval_steps_per_dispatch on the attached device.

The train path's dispatch-chaining knee was measured and shipped in r2/r3
(BASELINE.md matrix); the eval loop still paid one synchronous round trip
per batch (VERDICT r3 missing #4). This sweeps the fused-eval k at a
config's shipped eval shape and prints eval examples/s per k.

Timing per CLAUDE.md: evaluate() ends in host-side metric math over pulled
arrays (a synchronizing dependency on every logit); distinct batches are
inherent (the loader walks the eval split).

Usage: python tools/bench_eval.py [--config xlong_hpmn]
         [--ks 1,4,8,16] [--n_examples 40000] [--repeats 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="xlong_hpmn")
    ap.add_argument("--ks", default="1,4,8,16")
    ap.add_argument("--n_examples", type=int, default=40000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--streaming", action="store_true",
                    help="bench the streaming-estimator path instead")
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data.loader import DataLoader
    from hpmn_tpu.models import init_model
    from hpmn_tpu.train.evaluate import evaluate
    from hpmn_tpu.train.train import (make_datasets, make_eval_step,
                                      make_fused_eval)

    cfg = get_config(args.config)
    cfg.n_examples = args.n_examples
    _, val_arrays, _, spec = make_datasets(cfg)
    loader = DataLoader(val_arrays, cfg.eval_batch_size, shuffle=False)
    params = init_model(jax.random.key(0), cfg, spec.n_items, spec.n_cats)
    eval_step = make_eval_step(cfg)
    n = len(val_arrays["label"])
    sb = 4096 if args.streaming else 0

    results = {}
    for k in [int(x) for x in args.ks.split(",")]:
        fused = make_fused_eval(cfg) if k > 1 else None
        # warmup compile outside the timed repeats
        evaluate(eval_step, params, loader, streaming_bins=sb,
                 fused_eval=fused, steps_per_dispatch=k)
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            out = evaluate(eval_step, params, loader, streaming_bins=sb,
                           fused_eval=fused, steps_per_dispatch=k)
            times.append(time.time() - t0)
        dt = min(times)
        results[k] = n / dt
        print(f"k={k:3d}: {dt * 1e3:8.1f} ms/epoch, "
              f"{n / dt:10.1f} eval ex/s  (auc {out['auc']:.4f})",
              file=sys.stderr)
    print(json.dumps({"metric": "eval_throughput", "config": args.config,
                      "eval_batch_size": cfg.eval_batch_size, "n_eval": n,
                      "streaming": bool(sb),
                      **{f"k{k}_ex_per_sec": round(v, 1)
                         for k, v in results.items()}}))


if __name__ == "__main__":
    main()
