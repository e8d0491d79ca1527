"""Online-daemon throughput: concurrent clients vs the micro-batcher.

    python tools/bench_server.py [--clients 16] [--reqs 40] [--rows 8]
        [--force_cpu] [--mode predict|update] [--journal] [--saturation]

Spawns the ServingServer over a synthetic store, fires `clients` threads
each issuing `reqs` sequential requests of `rows` users, and reports
requests/s + rows/s + daemon-side latency percentiles (queue wait + fused
compute, from the dispatcher's own clock) twice: micro-batching ON (fuse
window 2 ms) and OFF (max_batch=1 — every request its own dispatch). One
JSON line.

``--mode update`` drives the lifelong-update path instead of predict;
``--journal`` attaches a write-ahead UpdateJournal so the fsync cost of
durability shows up in the same numbers (VERDICT r2 missing #5's "journal
penalty"). ``--saturation`` sweeps client counts (fused mode only) and
emits a {clients -> req/s, p50, p99} curve locating where the single
dispatcher thread saturates (VERDICT r2 weak #6).
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _run(store, clients, reqs, rows, max_batch, max_wait_ms, n_users,
         mode="predict", journal=None):
    from hpmn_tpu.serving.client import ServingClient
    from hpmn_tpu.serving.server import ServingServer

    rng = np.random.default_rng(0)
    with ServingServer(store, max_batch=max_batch, max_wait_ms=max_wait_ms,
                       journal=journal) as srv:
        # Warm the jit cache for every bucket size fusion can produce —
        # otherwise first-use compiles land inside the measured window.
        with ServingClient(srv.host, srv.port) as w:
            b = rows
            while True:
                w.predict([1] * b, [1] * b, [1] * b)
                w.update([1] * b, [1] * b, [1] * b)
                if b >= min(max_batch, clients * rows):
                    break
                b = min(b * 2, max(max_batch, 1))
        srv.batcher._lat.clear()  # warm-up latencies out of the window
        errs = []
        barrier = threading.Barrier(clients + 1)

        def client(ci):
            try:
                with ServingClient(srv.host, srv.port) as cl:
                    u = rng.integers(1, n_users, size=(reqs, rows))
                    barrier.wait(timeout=30)
                    call = cl.update if mode == "update" else cl.predict
                    for r in range(reqs):
                        call(u[r], u[r] % 997 + 1, u[r] % 20)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(clients)]
        [t.start() for t in threads]
        barrier.wait(timeout=30)
        t0 = time.perf_counter()
        [t.join() for t in threads]
        dt = time.perf_counter() - t0
        if errs:
            raise errs[0]
        stats = dict(srv.batcher.stats)
        lat = srv.batcher.latency_ms()
    n_req = clients * reqs
    return {"requests_per_s": round(n_req / dt),
            "rows_per_s": round(n_req * rows / dt),
            "avg_rows_per_dispatch": round(
                stats["fused_rows"] / max(1, stats["batches"]), 1),
            "dispatches": stats["batches"],
            "latency_ms": {k: lat[k] for k in ("p50", "p95", "p99")
                           if k in lat}}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--reqs", type=int, default=40)
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--n_users", type=int, default=4096)
    ap.add_argument("--force_cpu", action="store_true")
    ap.add_argument("--mode", choices=["predict", "update"],
                    default="predict")
    ap.add_argument("--journal", action="store_true",
                    help="attach a write-ahead UpdateJournal (tempfile) so "
                         "the durability fsync cost is in the numbers")
    ap.add_argument("--saturation", action="store_true",
                    help="sweep client counts (fused mode), emit the "
                         "dispatcher saturation curve")
    args = ap.parse_args(argv)

    if args.force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax

    from hpmn_tpu.configs import get_config
    from hpmn_tpu.models import init_model
    from hpmn_tpu.serving import UserMemoryStore

    cfg = get_config("taobao_hpmn")
    params = init_model(jax.random.key(0), cfg, 10_000, 20)
    store = UserMemoryStore(cfg, params)
    rng = np.random.default_rng(1)
    uids = np.arange(1, args.n_users + 1, dtype=np.int32)
    hist = rng.integers(1, 10_000, size=(args.n_users, 9)).astype(np.int32)
    store.ingest_histories(uids, hist, (hist % 20).astype(np.int32))

    journal = None
    jpath = None
    if args.journal:
        import tempfile

        from hpmn_tpu.serving.journal import UpdateJournal
        fd, jpath = tempfile.mkstemp(prefix="bench_journal_")
        os.close(fd)  # journal appends; 0-byte file gets the MAGIC header
        journal = UpdateJournal(jpath, fsync=True)
    try:
        if args.saturation:
            curve = []
            for c in (1, 2, 4, 8, 16, 32, 64):
                r = _run(store, c, args.reqs, args.rows, max_batch=256,
                         max_wait_ms=2.0, n_users=args.n_users,
                         mode=args.mode, journal=journal)
                curve.append({"clients": c,
                              "requests_per_s": r["requests_per_s"],
                              "rows_per_s": r["rows_per_s"],
                              **r["latency_ms"]})
            print(json.dumps({
                "metric": f"serving_daemon_saturation_{args.mode}",
                "rows_per_request": args.rows, "journal": args.journal,
                "curve": curve,
                "platform": jax.devices()[0].platform,
            }))
            return

        fused = _run(store, args.clients, args.reqs, args.rows,
                     max_batch=256, max_wait_ms=2.0, n_users=args.n_users,
                     mode=args.mode, journal=journal)
        solo = _run(store, args.clients, args.reqs, args.rows,
                    max_batch=1, max_wait_ms=0.0, n_users=args.n_users,
                    mode=args.mode, journal=journal)
        print(json.dumps({
            "metric": f"serving_daemon_{args.mode}",
            "rows_per_request": args.rows, "clients": args.clients,
            "journal": args.journal,
            "microbatched": fused, "unbatched": solo,
            "speedup": round(fused["rows_per_s"] / solo["rows_per_s"], 2),
            "platform": jax.devices()[0].platform,
        }))
    finally:
        if journal is not None:
            journal.close()
            os.unlink(jpath)


if __name__ == "__main__":
    main()
