"""Model comparison table — the reference repo's core experiment.

Trains every encoder family on one dataset with an equal budget and prints
an AUC / log-loss table (the paper's §5.2 comparison, on the synthetic
generators here; point --data_dir at preprocessed real data to reproduce
the paper's tables when the raw datasets are available).

    python tools/compare_models.py --dataset taobao --task periodic \
        --steps 500 [--models hpmn,gru4rec,dien] [--data_dir DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_MODELS = "hpmn,gru4rec,dien,rum,dnn,lstm,caser,shan,svdpp,bst"


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="taobao",
                   choices=["amazon", "taobao", "xlong"])
    p.add_argument("--task", default="ctr", choices=["ctr", "periodic"])
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--n_examples", type=int, default=20000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--models", default=DEFAULT_MODELS)
    p.add_argument("--data_dir", default="")
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", default="",
                   help="also write the table as JSON to this path")
    args = p.parse_args()

    from hpmn_tpu.configs import get_config
    from hpmn_tpu.train.train import train

    base = {"amazon": "amazon_hpmn", "taobao": "taobao_hpmn",
            "xlong": "xlong_hpmn"}[args.dataset]
    results = {}
    for name in args.models.split(","):
        cfg = get_config(base)
        cfg.model.name = name
        cfg.synthetic_task = args.task
        cfg.n_examples = args.n_examples
        cfg.data_dir = args.data_dir
        cfg.seed = args.seed
        cfg.train.batch_size = args.batch_size
        cfg.train.max_steps = args.steps
        cfg.train.eval_every = max(args.steps // 4, 1)
        cfg.train.log_every = 10 ** 9
        cfg.train.early_stop_patience = 10 ** 9
        cfg.model.use_pallas = args.use_pallas
        if cfg.train.steps_per_dispatch == 0:
            # quality comparison: skip the per-model autotune probes and
            # take the tunnel-measured knee (fused steps are bitwise
            # identical to k=1, so the trajectory is unchanged; this just
            # makes the 10-model on-chip protocol run ~10x cheaper)
            from hpmn_tpu.configs.base import MEASURED_DISPATCH_KNEES

            cfg.train.steps_per_dispatch = MEASURED_DISPATCH_KNEES.get(
                base, 8)
        if cfg.eval_steps_per_dispatch == 0:
            from hpmn_tpu.configs.base import MEASURED_EVAL_KNEES

            cfg.eval_steps_per_dispatch = MEASURED_EVAL_KNEES.get(base, 1)
        res = train(cfg, log=lambda s: None)
        results[name] = res
        print(f"{name:>8}: test AUC {res['test']['auc']:.4f}  "
              f"log-loss {res['test']['log_loss']:.4f}  "
              f"(best val {res['best_val_auc']:.4f})", flush=True)

    print("\n== final table (sorted by test AUC) ==")
    print(f"{'model':>8}  {'AUC':>7}  {'log-loss':>8}")
    for name, res in sorted(results.items(),
                            key=lambda kv: -kv[1]["test"]["auc"]):
        print(f"{name:>8}  {res['test']['auc']:.4f}  "
              f"{res['test']['log_loss']:.4f}")

    if args.json:
        import json
        import math

        def num(x):  # nan/inf (single-class split, preempted run) -> null:
            return x if math.isfinite(x) else None  # bare NaN isn't JSON

        with open(args.json, "w") as f:
            json.dump({
                "dataset": args.dataset, "task": args.task,
                "steps": args.steps, "seed": args.seed,
                "results": {name: {"auc": num(res["test"]["auc"]),
                                   "log_loss": num(res["test"]["log_loss"]),
                                   "best_val_auc": num(res["best_val_auc"])}
                            for name, res in results.items()},
            }, f, indent=2, allow_nan=False)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
