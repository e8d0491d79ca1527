"""Serving-path micro-benchmark: lifelong incremental updates + predicts.

The paper's deployment claim is O(1) amortized memory updates per user
event ([P §4.5]); this quantifies events/s and predictions/s for the
batched serving store on the current backend.

    python tools/bench_serving.py [batch_size]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data.synthetic import XLONG
    from hpmn_tpu.models import init_model
    from hpmn_tpu.serving import UserMemoryStore

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cfg = get_config("xlong_hpmn")
    params = init_model(jax.random.key(0), cfg, XLONG.n_items, XLONG.n_cats)
    store = UserMemoryStore(cfg, params)
    rng = np.random.default_rng(0)
    uids = np.arange(B)

    def one_round(n):
        for _ in range(n):
            items = rng.integers(1, XLONG.n_items, B).astype(np.int32)
            store.update(uids, items, (items % XLONG.n_cats).astype(np.int32))

    one_round(3)  # warmup/compile
    t0 = time.time()
    one_round(20)
    dt = time.time() - t0
    print(f"update: {20 * B / dt:,.0f} events/s (batch {B}, "
          f"{cfg.model.hpmn_layers} layers)")

    cand = rng.integers(1, XLONG.n_items, B).astype(np.int32)
    store.predict(uids, cand, (cand % XLONG.n_cats).astype(np.int32))
    t0 = time.time()
    for _ in range(20):
        s = store.predict(uids, cand, (cand % XLONG.n_cats).astype(np.int32))
    dt = time.time() - t0
    print(f"predict: {20 * B / dt:,.0f} scores/s")


if __name__ == "__main__":
    main()
