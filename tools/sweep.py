"""Hyperparameter sweep: cartesian grid of config overrides, one training
run per point, best-by-val-AUC summary.

    python tools/sweep.py --config amazon_hpmn \
        --grid train.lr=1e-3,3e-4 model.mem_dim=16,32 \
        [--set n_examples=20000 train.max_steps=2000] \
        [--out sweep.jsonl] [--force_cpu]

The reference's tuning workflow was hand-edited hyperparameter dicts
(SURVEY.md §5.6); this makes it one command. Emits one JSON line per trial
(and appends to --out if given), then a final {"best": ...} line. Values
are type-coerced against the config like every other CLI (--set syntax).
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--grid", nargs="+", required=True,
                    help="key=v1,v2,... axes (cartesian product)")
    ap.add_argument("--set", nargs="*", default=[],
                    help="fixed overrides applied to every trial")
    ap.add_argument("--metric", default="best_val_auc")
    ap.add_argument("--out", default="")
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides env

    from hpmn_tpu.configs import get_config
    from hpmn_tpu.train.train import apply_overrides, train

    axes = []
    for spec in args.grid:
        key, vals = spec.split("=", 1)
        axes.append([(key, v) for v in vals.split(",") if v])

    best = None
    sink = open(args.out, "a") if args.out else None
    for point in itertools.product(*axes):
        overrides = args.set + [f"{k}={v}" for k, v in point]
        cfg = apply_overrides(get_config(args.config), overrides)
        if cfg.train.steps_per_dispatch == 0:
            # quality sweep: skip the per-trial throughput autotune probe
            cfg.train.steps_per_dispatch = 1
        if cfg.eval_steps_per_dispatch == 0:
            cfg.eval_steps_per_dispatch = 1
        res = train(cfg, log=lambda s: None)
        row = {"trial": dict(point),
               "best_val_auc": res["best_val_auc"],
               "test_auc": res["test"]["auc"],
               "test_gauc": res["test"]["gauc"],
               "test_log_loss": res["test"]["log_loss"],
               "best_step": res["best_step"]}
        if args.metric not in row:
            raise SystemExit(f"--metric {args.metric!r} is not reported; "
                             f"choose from {sorted(set(row) - {'trial'})}")
        score = row[args.metric]
        line = json.dumps(row)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()
        if score == score and (best is None or score > best[0]):
            best = (score, row)
    if sink:
        sink.close()
    print(json.dumps({"best": best[1] if best else None,
                      "metric": args.metric}))


if __name__ == "__main__":
    main()
