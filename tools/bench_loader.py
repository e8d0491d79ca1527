"""Host-side batch-assembly throughput: numpy vs the native threaded core.

    python tools/bench_loader.py [--n 200000] [--t 1000] [--b 512]

Context (ARCHITECTURE §2 data layer): one chip trains XLong at ~31k ex/s;
a host feeding several chips of a DP mesh multiplies the assembly demand,
and single-threaded numpy ceilings around ~110k ex/s at these shapes. This
prints one JSON line with both rates so the host headroom is a recorded
number, not a guess.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args(argv)

    from hpmn_tpu.data import native_batcher

    rng = np.random.default_rng(0)
    n, t, b = args.n, args.t, args.b
    arrays = {
        "item_seq": rng.integers(0, 1 << 20, (n, t)).astype(np.int32),
        "cat_seq": rng.integers(0, 1000, (n, t)).astype(np.int32),
        "neg_item_seq": rng.integers(0, 1 << 20, (n, t)).astype(np.int32),
        "neg_cat_seq": rng.integers(0, 1000, (n, t)).astype(np.int32),
        "seq_mask": np.ones((n, t), np.float32),
        "uid": np.arange(n, dtype=np.int32),
        "target_item": rng.integers(0, 1 << 20, n).astype(np.int32),
        "target_cat": rng.integers(0, 1000, n).astype(np.int32),
        "label": rng.integers(0, 2, n).astype(np.float32),
    }
    idxs = [rng.permutation(n)[:b] for _ in range(args.iters)]

    def rate(fn):
        fn(idxs[0])  # warm (native: builds/starts the pool)
        t0 = time.perf_counter()
        for idx in idxs:
            fn(idx)
        return args.iters * b / (time.perf_counter() - t0)

    numpy_rate = rate(lambda idx: {k: v[idx] for k, v in arrays.items()})
    native_rate = (rate(lambda idx: native_batcher.gather(arrays, idx))
                   if native_batcher.available() else None)
    print(json.dumps({
        "metric": "batch_assembly_examples_per_s",
        "numpy": round(numpy_rate),
        "native": round(native_rate) if native_rate else None,
        "speedup": round(native_rate / numpy_rate, 2) if native_rate else None,
        "threads": native_batcher.n_threads(),
        "shape": {"n": n, "t": t, "b": b},
    }))


if __name__ == "__main__":
    main()
