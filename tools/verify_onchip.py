"""On-chip compiled-kernel parity gate: Pallas vs XLA, loss + grads.

Round-1 recorded pallas-vs-XLA compiled diffs in prose (STATUS.md); this
tool makes them a reproducible one-command gate so kernel changes can be
regression-tested on real hardware (VERDICT r1 weak #4, SURVEY.md §4 item 1).

For each config it builds one batch, computes (loss, grads) with the plain
XLA hierarchical path and with the fused Pallas kernels — both COMPILED
(not interpret mode) on whatever backend is present (the tunneled TPU here;
also runs on CPU where Pallas uses the interpreter automatically only if
forced — on CPU this is still a meaningful compiled-Mosaic-interpret gate).

Prints ONE JSON line:
  {"configs": {name: {"loss_diff": .., "grad_maxdiff": .., "grad_scale": ..,
               "pass": bool}}, "pass": bool}

Tolerances are per-config: HPMN's single-kernel chain agrees to ~1e-5;
DIEN's two chained scans + attention amplify f32 reassociation noise
(~1e-3 relative worst-element, STATUS.md "Known gaps") — tracked here so it
cannot silently regress further.

Usage: python tools/verify_onchip.py [--configs xlong_hpmn,taobao_dien]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

# (loss_atol, grad_rtol): grad bar is on worst-element diff / grad scale,
# where scale = max |grad| over the tree (reassociation noise is absolute
# per dot-product, so relative-to-scale is the stable criterion).
TOLERANCES = {
    "xlong_hpmn": (1e-5, 2e-3),
    "taobao_hpmn": (1e-5, 2e-3),
    "amazon_hpmn": (1e-5, 2e-3),
    "taobao_dien": (1e-5, 5e-2),
    "amazon_gru4rec": (1e-5, 2e-3),
}


def check_config(name: str, batch_size: int = 64, seed: int = 0):
    from hpmn_tpu.configs import get_config
    from hpmn_tpu.data.schema import dummy_batch, to_device_arrays
    from hpmn_tpu.data.synthetic import SPECS
    from hpmn_tpu.models import init_model, loss_fn

    cfg = get_config(name)
    spec = SPECS[cfg.dataset]
    batch = to_device_arrays(dummy_batch(
        batch_size, spec.seq_len, n_items=spec.n_items, n_cats=spec.n_cats,
        seed=seed))
    params = init_model(jax.random.key(seed), cfg, spec.n_items, spec.n_cats)

    def run(use_pallas: bool):
        cfg.model.use_pallas = use_pallas
        f = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(p, cfg, batch)[0]))
        loss, grads = f(params)
        return float(loss), jax.device_get(grads)

    loss_x, grads_x = run(False)
    loss_p, grads_p = run(True)

    flat_x = np.concatenate([np.ravel(g) for g in jax.tree.leaves(grads_x)])
    flat_p = np.concatenate([np.ravel(g) for g in jax.tree.leaves(grads_p)])
    grad_scale = float(np.max(np.abs(flat_x)))
    grad_maxdiff = float(np.max(np.abs(flat_x - flat_p)))
    loss_diff = abs(loss_x - loss_p)

    loss_atol, grad_rtol = TOLERANCES[name]
    ok = loss_diff < loss_atol and grad_maxdiff < grad_rtol * grad_scale
    return {
        "loss_diff": loss_diff,
        "grad_maxdiff": grad_maxdiff,
        "grad_scale": grad_scale,
        "grad_rel": grad_maxdiff / max(grad_scale, 1e-30),
        "pass": ok,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="xlong_hpmn,taobao_dien")
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args()

    out = {"platform": jax.devices()[0].platform, "configs": {}}
    for name in args.configs.split(","):
        out["configs"][name] = check_config(name, args.batch_size)
        print(f"# {name}: {out['configs'][name]}", file=sys.stderr)
    out["pass"] = all(c["pass"] for c in out["configs"].values())
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
