"""Measure the autotune probes' startup cost (VERDICT r4 next #6).

The k/ke ladder probes compile one program per rung before step 1; on a
TPU each compile is 20-40 s, so a fresh launch paid minutes of dead time
with nothing recorded. r5 cut it three ways: the persistent compilation
cache ships ON (~/.cache/hpmn_tpu/xla — rung compiles are cached across
runs AND shared with the training step itself), the ladder stops early
after two flat rungs, and the eval ladder is capped by the eval epoch's
batch count. This tool quantifies the remaining cost on the attached
link, in three legs:

  cold   — fresh (empty) compilation cache, probes on: the worst case.
  warm   — same cache reused, probes on: the relaunch case (what a
           preempted run without a ckpt-dir sidecar pays).
  pinned — knees pinned explicitly, warm cache: the no-probe floor.

One JSON line: wall seconds from train() entry to the FIRST training
dispatch completing (probes + compiles + the first fused step, not the
rest of the --steps run) for each leg, plus the probe lines' own
timestamps.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed_run(config, cache_dir, auto, steps):
    from hpmn_tpu.configs import get_config
    from hpmn_tpu.configs.base import (MEASURED_DISPATCH_KNEES,
                                       MEASURED_EVAL_KNEES)
    from hpmn_tpu.train.train import train

    cfg = get_config(config)
    cfg.train.compilation_cache_dir = cache_dir
    cfg.train.max_steps = steps
    cfg.train.eval_every = steps
    # log_every=1 logs at EVERY dispatch boundary, so the first "step "
    # line lands right after the first fused dispatch completes — the
    # startup cost this tool measures. (log_every=steps would defer the
    # first line past ALL --steps training steps, folding the whole
    # training run into "to_first_step_s".)
    cfg.train.log_every = 1
    cfg.train.early_stop_patience = 10 ** 9
    if not auto:
        cfg.train.steps_per_dispatch = MEASURED_DISPATCH_KNEES.get(
            config, 8)
        cfg.eval_steps_per_dispatch = MEASURED_EVAL_KNEES.get(config, 8)
    else:
        cfg.train.steps_per_dispatch = 0
        cfg.eval_steps_per_dispatch = 0
    t0 = time.time()
    events = []
    train(cfg, log=lambda s: events.append((time.time() - t0, s)))
    first_step = next((t for t, s in events if s.startswith("step ")),
                      float("nan"))
    probes = {s.split("=")[0].split()[-1]: round(t, 1)
              for t, s in events if s.startswith("autotuned ")}
    return {"to_first_step_s": round(first_step, 1), "probe_done_at": probes}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="xlong_hpmn")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--force_cpu", action="store_true")
    ap.add_argument("--one", default="", help=argparse.SUPPRESS)
    ap.add_argument("--cache", default="", help=argparse.SUPPRESS)
    args = ap.parse_args(argv)
    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.one:  # child: one leg in a FRESH process (no in-memory jit
        #           cache — only the persistent on-disk cache carries over)
        print(json.dumps(timed_run(args.config, args.cache,
                                   auto=args.one != "pinned",
                                   steps=args.steps)))
        return

    import subprocess

    def leg(name, cache):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             "--cache", cache, "--config", args.config,
             "--steps", str(args.steps)]
            + (["--force_cpu"] if args.force_cpu else []),
            capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            raise RuntimeError(f"{name} leg failed:\n{r.stderr[-2000:]}")
        sys.stderr.write(r.stderr[-500:])
        return json.loads([ln for ln in r.stdout.splitlines()
                           if ln.startswith("{")][-1])

    out = {"metric": "autotune_probe_cost", "config": args.config}
    with tempfile.TemporaryDirectory() as fresh:
        out["cold"] = leg("cold", fresh)
        out["warm"] = leg("warm", fresh)
        out["pinned"] = leg("pinned", fresh)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
