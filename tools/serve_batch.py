"""Batch scorer over a serving bundle — the offline serving entry point.

Loads any ``save_bundle`` artifact (HPMN memory store or the BST-family
history store — dispatched on the bundle's store kind) and scores
candidate items for users, reading requests from an npz and writing
scores back:

    python tools/serve_batch.py --bundle DIR --requests req.npz --out out.npz
        [--device_resident] [--update]

Request npz schema:
  uids        int32 [B]
  cand_items  int32 [B] (predict) or [B, C] (rank)
  cand_cats   int32, same shape as cand_items
  (with --update) item_ids, cat_ids  int32 [B]: ingest one event per user
  BEFORE scoring (the online update-then-score request shape, [P §4.5]).

Output npz: scores float32 [B] or [B, C].
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bundle", required=True)
    ap.add_argument("--requests", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--device_resident", action="store_true")
    ap.add_argument("--update", action="store_true",
                    help="apply item_ids/cat_ids as one new event per user "
                         "before scoring")
    ap.add_argument("--force_cpu", action="store_true",
                    help="run on the host CPU (tests / no-TPU machines)")
    args = ap.parse_args(argv)

    if args.force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides env

    from hpmn_tpu.serving import load_bundle

    store = load_bundle(args.bundle, device_resident=args.device_resident)
    req = np.load(args.requests)
    uids = req["uids"]
    if args.update:
        store.update(uids, req["item_ids"], req["cat_ids"])
    cand_i, cand_c = req["cand_items"], req["cand_cats"]
    if cand_i.ndim == 2:
        scores = store.rank(uids, cand_i, cand_c)
    else:
        scores = store.predict(uids, cand_i, cand_c)
    np.savez(args.out, scores=np.asarray(scores, np.float32))
    if args.update:
        store.save(args.bundle)  # persist the advanced memories
    print(f"scored {scores.shape} -> {args.out}")


if __name__ == "__main__":
    main()
