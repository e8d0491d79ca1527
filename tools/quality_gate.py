"""Reduced on-chip quality regression gate (VERDICT r4 next #5).

The full end-of-round protocol trains all ten model families on the
planted long-range task and checks the two-tier ordering (BASELINE.md
"Quality datapoints"). This gate is the cheap always-on version folded
into ``bench.py --gate``: ONE model per tier, same task/shapes/seed as
the r2/r3/r4 protocol runs —

- **hpmn** (recurrent-bottleneck tier): must be clearly above chance on
  the planted long-range task (r2/r3 reference: test AUC 0.578; gate
  floor 0.55). A silent kernel/config/data regression that breaks the
  periodic hierarchy shows up here first.
- **dnn** (direct-access tier): pooling reads every position, so it
  solves the membership-style synthetic by construction (reference 0.904;
  gate floor 0.85). A pipeline/label regression that breaks ALL models
  shows up here even when hpmn's recurrence is fine.

Exit 0 with one JSON line on success; exit 1 with the failing numbers
otherwise. ~2 model trainings of 2000 steps (a few minutes on chip).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLOORS = {"hpmn": 0.55, "dnn": 0.85}


def run(steps: int = 2000, use_pallas: bool = True, seed: int = 0,
        batch_size: int = 128):
    from hpmn_tpu.configs import get_config
    from hpmn_tpu.train.train import train

    results = {}
    for name in FLOORS:
        cfg = get_config("taobao_hpmn")
        cfg.model.name = name
        cfg.synthetic_task = "periodic"
        cfg.seed = seed
        cfg.train.batch_size = batch_size
        cfg.train.max_steps = steps
        cfg.train.eval_every = max(steps // 4, 1)
        cfg.train.log_every = 10 ** 9
        cfg.train.early_stop_patience = 10 ** 9
        cfg.model.use_pallas = use_pallas and name == "hpmn"
        cfg.train.steps_per_dispatch = 8  # fixed shape: gate compares runs
        cfg.eval_steps_per_dispatch = 1
        res = train(cfg, log=lambda s: None)
        results[name] = float(res["test"]["auc"])
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--no_pallas", action="store_true")
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    results = run(steps=args.steps, use_pallas=not args.no_pallas)
    failures = {m: (auc, FLOORS[m]) for m, auc in results.items()
                if auc < FLOORS[m]}
    out = {"metric": "quality_gate", "steps": args.steps,
           "auc": {m: round(a, 4) for m, a in results.items()},
           "floors": FLOORS, "passed": not failures}
    print(json.dumps(out))
    if failures:
        print(f"QUALITY GATE FAILED: {failures}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
