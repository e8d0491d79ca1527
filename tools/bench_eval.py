"""Eval-loop wall time vs eval_steps_per_dispatch on the attached device.

The train path's dispatch-chaining knee was measured and shipped in r2/r3
(BASELINE.md matrix); the eval loop still paid one synchronous round trip
per batch (VERDICT r3 missing #4). This sweeps the fused-eval k at a
config's shipped eval shape and prints eval examples/s per k.

Timing per CLAUDE.md: evaluate() ends in host-side metric math over pulled
arrays (a synchronizing dependency on every logit); distinct batches are
inherent (the loader walks the eval split).

``--processes N`` (r5, VERDICT r4 next #1) measures the MULTI-HOST regime
— the one where the r4 chaining win used to evaporate behind the
``process_count == 1`` gate: N OS processes under
``jax.distributed.initialize`` (1 virtual CPU device each), per-host
DataLoader shards, the production sharded eval step
(``make_sharded_steps``), and the cross-host metric merge inside the
timed epoch. The same flag measures real multi-host hardware the moment
it exists (drop the implied --force_cpu by editing env below).

Usage: python tools/bench_eval.py [--config xlong_hpmn]
         [--ks 1,4,8,16] [--n_examples 40000] [--repeats 3]
         [--processes 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="xlong_hpmn")
    ap.add_argument("--ks", default="1,4,8,16")
    ap.add_argument("--n_examples", type=int, default=40000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--streaming", action="store_true",
                    help="bench the streaming-estimator path instead")
    ap.add_argument("--force_cpu", action="store_true")
    ap.add_argument("--processes", type=int, default=1,
                    help="multi-host-sim: N OS processes, per-host loader "
                         "shards, cross-host merges inside the timed epoch")
    ap.add_argument("--worker", type=int, default=-1, help=argparse.SUPPRESS)
    ap.add_argument("--port", type=int, default=0, help=argparse.SUPPRESS)
    return ap


def run_sweep(args):
    """Time one eval-epoch k sweep in THIS process (single- or multi-host;
    under multi-host every process runs this in lockstep)."""
    import jax

    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data.loader import DataLoader
    from hpmn_tpu.train.evaluate import evaluate
    from hpmn_tpu.train.train import (make_datasets, make_eval_step,
                                      make_fused_eval, make_optimizer)

    cfg = get_config(args.config)
    cfg.n_examples = args.n_examples
    pidx, pcnt = jax.process_index(), jax.process_count()
    _, val_arrays, _, spec = make_datasets(cfg)
    loader = DataLoader(val_arrays, cfg.eval_batch_size, shuffle=False,
                        process_index=pidx, process_count=pcnt)
    if pcnt > 1:
        # The production multi-host shape: sharded eval step over the mesh,
        # per-host batch assembly (shard_batch -> process-local data), the
        # stacked shard-local row extraction, cross-host metric merge.
        from hpmn_tpu.models import init_model  # noqa: F401 (spec parity)
        from hpmn_tpu.parallel import (init_sharded_model, make_mesh,
                                       make_sharded_steps, shard_batch)

        mesh = make_mesh(1)
        params = init_sharded_model(jax.random.key(0), cfg, spec.n_items,
                                    spec.n_cats, mesh)
        _, jit_eval = make_sharded_steps(cfg, make_optimizer(cfg), mesh)
        _es = jit_eval(params)
        eval_step = lambda p, b: _es(p, shard_batch(mesh, b))
        _fe = jit_eval.fused(params)
        fused_any = lambda p, bs: _fe(p, shard_batch(mesh, bs, stacked=True))
    else:
        from hpmn_tpu.models import init_model

        params = init_model(jax.random.key(0), cfg, spec.n_items, spec.n_cats)
        eval_step = make_eval_step(cfg)
        fused_any = make_fused_eval(cfg)
    n = None  # global eval-set size, read off the first evaluate() result
    sb = 4096 if args.streaming else 0

    results = {}
    for k in [int(x) for x in args.ks.split(",")]:
        fused = fused_any if k > 1 else None
        # warmup compile outside the timed repeats
        out = evaluate(eval_step, params, loader, streaming_bins=sb,
                       fused_eval=fused, steps_per_dispatch=k)
        n = int(out["n"])
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            out = evaluate(eval_step, params, loader, streaming_bins=sb,
                           fused_eval=fused, steps_per_dispatch=k)
            times.append(time.time() - t0)
        dt = min(times)
        results[k] = n / dt
        if pidx == 0:
            print(f"k={k:3d}: {dt * 1e3:8.1f} ms/epoch, "
                  f"{n / dt:10.1f} eval ex/s  (auc {out['auc']:.4f})",
                  file=sys.stderr)
    if pidx == 0:
        print(json.dumps({
            "metric": "eval_throughput", "config": args.config,
            "eval_batch_size": cfg.eval_batch_size, "n_eval": n,
            "processes": pcnt, "streaming": bool(sb),
            **{f"k{k}_ex_per_sec": round(v, 1) for k, v in results.items()}}))


def spawn_processes(args):
    """Parent: N workers re-exec this file under jax.distributed (CPU,
    1 virtual device per process) and rank 0's output is relayed.

    Worker output goes to FILES, not pipes: a rank whose PIPEd stderr
    fills the 64KB buffer blocks mid-collective, wedging every other
    rank (the parent would then sit in a sequential communicate() until
    its timeout with N stuck processes)."""
    import subprocess
    import tempfile

    import portpicker

    port = portpicker.pick_unused_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    with tempfile.TemporaryDirectory() as td:
        logs = [(open(os.path.join(td, f"out{r}"), "w+"),
                 open(os.path.join(td, f"err{r}"), "w+"))
                for r in range(args.processes)]
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(r), "--port", str(port),
                 "--processes", str(args.processes),
                 "--config", args.config, "--ks", args.ks,
                 "--n_examples", str(args.n_examples),
                 "--repeats", str(args.repeats)]
                + (["--streaming"] if args.streaming else []),
                env=env, stdout=logs[r][0],
                stderr=sys.stderr if r == 0 else logs[r][1], text=True)
            for r in range(args.processes)]
        def read(f):
            f.seek(0)
            return f.read()

        try:
            for p in procs:
                p.wait(timeout=1800)
        except subprocess.TimeoutExpired:
            # Report the wedged ranks' log tails BEFORE the tempdir (and
            # with it every worker log) is cleaned up — the whole point of
            # logging to files was diagnosing this scenario.
            for p in procs:
                if p.poll() is None:
                    p.kill()
                p.wait()
            tails = "\n".join(
                f"-- worker {r} (stdout) --\n{read(logs[r][0])[-1000:]}\n"
                f"-- worker {r} (stderr) --\n{read(logs[r][1])[-1000:]}"
                for r in range(args.processes))
            raise RuntimeError(f"worker timeout (1800s); logs:\n{tails}")
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
        for r, p in enumerate(procs):
            if p.returncode != 0:
                raise RuntimeError(
                    f"worker {r} failed:\n{read(logs[r][1])[-2000:]}"
                    f"\n{read(logs[r][0])[-2000:]}")
        sys.stdout.write(read(logs[0][0]))
        for fo, fe in logs:
            fo.close(), fe.close()


def main(argv=None):
    args = build_args().parse_args(argv)
    if args.worker >= 0:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from hpmn_tpu.parallel.distributed import initialize

        initialize(coordinator_address=f"127.0.0.1:{args.port}",
                   num_processes=args.processes, process_id=args.worker)
        run_sweep(args)
        return
    if args.processes > 1:
        spawn_processes(args)
        return
    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    run_sweep(args)


if __name__ == "__main__":
    main()
