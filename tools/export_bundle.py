"""Export a training checkpoint as a self-contained serving bundle.

    python tools/export_bundle.py --ckpt_dir DIR --config xlong_hpmn
        [--set key=value ...] --out BUNDLE_DIR
        [--step N]              # default: best-val-AUC step, else latest
        [--histories hist.npz]  # bootstrap user memories (one batched
                                # encode): uids [U], item_seqs [U, T],
                                # cat_seqs [U, T], optional masks [U, T]
        [--quantize]            # int8 per-row embedding tables (~4x smaller)
        [--force_cpu]

Completes the deployment loop as commands: `hpmn-train --set
train.ckpt_dir=...` -> export_bundle -> `hpmn-serve --bundle ...`
(docs/MIGRATION.md "Checkpoints, serving, deployment").
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--set", nargs="*", default=[])
    ap.add_argument("--out", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--histories", default="")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--ema", action="store_true",
                    help="serve the Polyak/EMA-averaged weights from the "
                         "checkpoint's opt state (requires the run to have "
                         "trained with train.ema_decay > 0; pass the same "
                         "--set train.ema_decay=... used in training)")
    ap.add_argument("--export_compiled", action="store_true",
                    help="also serialize the update/predict/rank request "
                         "functions as multi-platform StableHLO so the "
                         "daemon can serve with --aot (no model code)")
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated export platforms "
                         "(with --export_compiled)")
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides env

    import jax

    from hpmn_tpu.configs import get_config
    from hpmn_tpu.models import init_model
    from hpmn_tpu.serving import UserMemoryStore
    from hpmn_tpu.train.checkpoint import CheckpointManager
    from hpmn_tpu.train.train import apply_overrides, make_optimizer

    cfg = apply_overrides(get_config(args.config), args.set)
    mngr = CheckpointManager(args.ckpt_dir)
    step = args.step if args.step is not None else (
        mngr.best_step() or mngr.latest_step())
    if step is None:
        sys.exit(f"no checkpoints in {args.ckpt_dir}")

    # Pass 1 (untyped) reads the vocab sizes; pass 2 restores against a
    # same-config init skeleton so namedtuple/None leaves come back typed.
    # The opt state's template is the RAW restored structure — serving
    # doesn't care which optimizer (or wrappers like EMA/MultiSteps) the
    # run trained with, so exporting must not require reconstructing it —
    # EXCEPT under --ema, which reads the typed EmaState out of it and
    # therefore needs the matching optimizer config.
    raw = mngr.restore(step)
    emb = raw["params"]["embedding"]
    n_items, n_cats = emb["item"].shape[0], emb["cat"].shape[0]
    n_users_emb = emb["user"].shape[0] if "user" in emb else 0
    skeleton = init_model(jax.random.key(0), cfg, n_items, n_cats,
                          n_users=n_users_emb)
    opt_template = (make_optimizer(cfg).init(skeleton) if args.ema
                    else raw["opt_state"])
    state = mngr.restore(step, template={
        "params": skeleton, "opt_state": opt_template,
        "loader": {"epoch": 0, "step": 0, "seed": 0, "global_batch": 0},
        "step": 0})
    mngr.close()

    serve_params = state["params"]
    if args.ema:
        from hpmn_tpu.train.train import get_ema_params

        serve_params = get_ema_params(state["opt_state"])
        if serve_params is None:
            sys.exit("--ema: checkpoint's opt state carries no EMA shadow "
                     "(was the run trained with train.ema_decay > 0? pass "
                     "the same --set train.ema_decay=...)")

    # Store kind follows the STRUCTURAL family boundary: families with a
    # target-independent encoder recurrence (hpmn/gru4rec/rum —
    # serving.protocol.O1_FAMILIES) get the O(1) state arena; target-
    # dependent families (BST, DIEN) serve from the recent-history window
    # store (serving/history.py).
    from hpmn_tpu.serving import O1_FAMILIES

    if cfg.model.name in O1_FAMILIES:
        store = UserMemoryStore(cfg, serve_params)
    else:
        from hpmn_tpu.serving import HistoryStore

        store = HistoryStore(cfg, serve_params)
    bundle_kw = dict(quantize_embeddings=args.quantize,
                     export_compiled=args.export_compiled,
                     export_platforms=tuple(args.platforms.split(",")))
    if args.histories:
        z = np.load(args.histories)
        store.ingest_histories(z["uids"], z["item_seqs"], z["cat_seqs"],
                               masks=z["masks"] if "masks" in z.files
                               else None)
    os.makedirs(args.out, exist_ok=True)
    store.save_bundle(args.out, **bundle_kw)
    kind = "memory" if isinstance(store, UserMemoryStore) else "history"
    print(f"exported step {step} -> {args.out} "
          f"(store={kind}, "
          f"n_users={store.n_users}, quantized={args.quantize}, "
          f"ema={args.ema}, aot={args.export_compiled})")


if __name__ == "__main__":
    main()
