"""Standard-harness throughput for ANY driver config (VERDICT r2 weak #2:
the per-config measured matrix). One JSON line per run:

    python tools/bench_config.py --config taobao_hpmn [--batch 512] [--k 16]
        [--no_flagship]

Reuses bench.py's measurement path (make_multistep_train, k fused steps per
dispatch, distinct batches, scalar-pull sync — the tunnel traps per
CLAUDE.md / ARCHITECTURE.md §8), so every config's number is comparable
with the recorded xlong_hpmn headline.

--no_flagship times the config's literal defaults; by default the GRU-scan
models get the flagship perf flags the headline rows use (use_pallas +
bf16 scan + assume_full_mask on full-length synthetic batches — the
synthetic bench data IS full-length, so the flag is exact here).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--batch", type=int, default=0,
                    help="override train.batch_size (0 = config default)")
    ap.add_argument("--k", type=int, default=0,
                    help="override steps_per_dispatch (0 = config default)")
    ap.add_argument("--no_flagship", action="store_true",
                    help="time the config's literal flags (no Pallas/bf16)")
    ap.add_argument("--n_dispatch", type=int, default=3)
    args = ap.parse_args()

    import jax

    import bench  # repo-root harness: _make_batches, _bench_train_step
    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data.synthetic import SPECS
    from hpmn_tpu.models import init_model

    cfg = get_config(args.config)
    if args.batch:
        cfg.train.batch_size = args.batch
    # Configs ship steps_per_dispatch=0 (auto-probe at train startup); this
    # harness measures a FIXED k, so auto resolves to the recorded tunnel
    # knee (override with --k).
    from hpmn_tpu.configs.base import MEASURED_DISPATCH_KNEES

    k = (args.k or cfg.train.steps_per_dispatch
         or MEASURED_DISPATCH_KNEES.get(args.config, 16))
    spec = SPECS[cfg.dataset]

    flagship = not args.no_flagship
    if flagship and cfg.model.name in ("hpmn", "gru4rec", "dien"):
        cfg.model.use_pallas = True
        cfg.model.scan_dtype = "bfloat16"
        cfg.model.assume_full_mask = True
        if cfg.model.name == "hpmn":
            cfg.model.use_hierarchical_scan = True

    batches = bench._make_batches(cfg, spec, 4, cfg.train.batch_size)
    params = init_model(jax.random.key(0), cfg, spec.n_items, spec.n_cats)
    ex_s = bench._bench_train_step(cfg, params, batches,
                                   n_dispatch=args.n_dispatch, k=k)
    print(json.dumps({
        "config": args.config, "model": cfg.model.name,
        "batch": cfg.train.batch_size, "steps_per_dispatch": k,
        "flagship_flags": flagship and cfg.model.name in
        ("hpmn", "gru4rec", "dien"),
        "ms_per_step": round(cfg.train.batch_size / ex_s * 1e3, 3),
        "examples_per_s_per_chip": round(ex_s, 1),
    }))


if __name__ == "__main__":
    main()
