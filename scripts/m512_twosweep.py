#!/usr/bin/env python
"""Multi-sweep bisect of the M=512 post-growth collapse.

m512_bisect.py showed ONE post-growth sweep keeps standalone val at 1.0
while inflating max|label| to ~2.7e9; the trainer collapses at its
SECOND batch (the first batch's pre-sweep accuracy is fine, the second
batch's is ~0.10). This script runs K consecutive sweeps from the same
grown state on successive loader batches, recording after each sweep:

  * the IN-SWEEP pre-update forward accuracy of the NEXT sweep (what the
    trainer prints as per-batch train accuracy),
  * the standalone ``evaluate_accuracy`` val,
  * finiteness and max-abs of sites / label / forward scores.

This adjudicates (a) collapse-at-sweep-2 (norm-inflated state poisoning
the following sweep, e.g. f32 overflow in its Gram/NS) vs (b) a
discrepancy between the in-sweep forward and the standalone forward on
the SAME post-sweep-1 state.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--grow_to", type=int, default=512)
    ap.add_argument("--method", default=None,
                    help="split backend; default cholqr on CPU, polar on TPU")
    ap.add_argument("--spread", action="store_true",
                    help="norm_spread=True for the post-growth sweeps "
                         "(prefix stays original-gauge to reproduce the "
                         "collapse state exactly)")
    ap.add_argument("--out", default="/root/repo/results/m512_twosweep.json")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from quality_gates import _make_data_for
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.data.mnist import max_pool_2x2
    from tensornetworkforml_tpu.models.mps import (
        accuracy_from_scores,
        grow_bond,
        mps_forward,
        product_init,
    )
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once
    from tensornetworkforml_tpu.train.trainer import (
        evaluate_accuracy,
        train_model,
    )

    method = args.method or ("polar" if args.tpu else "cholqr")

    tr_x, tr_y, te_x, te_y = _make_data_for("fashion")
    tr_x, te_x = max_pool_2x2(tr_x), max_pool_2x2(te_x)
    tr_x = tr_x.reshape(len(tr_x), -1) / max(1.0, tr_x.max())
    te_x = te_x.reshape(len(te_x), -1) / max(1.0, te_x.max())
    data = np.concatenate([tr_x, te_x])
    labels = np.concatenate([tr_y, te_y])
    tl, vl, _ = prepare_dataset(
        data, labels, len(tr_x) / len(data), 0.1, 256, 512, 512,
        embed=False, seed=0, even_train_batches=True,
    )
    x_cal, _ = next(tl.batches())
    mps = product_init(
        jax.random.PRNGKey(0), N=196, M=32, L=10, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float32, calibration_x=x_cal[:256],
    )
    mps, val_acc, _ = train_model(
        mps, tl, vl, lr=0.1, n_epochs=4, weight_dec=1e-5, L2_flag=False,
        split_mode="canonical", svd_method=method,
        verbose=False, warmup_epochs=1, bond_schedule={2: 128},
        restarts=0, norm_spread=False,
    )
    out = {
        "backend": jax.default_backend(),
        "method": method,
        "spread": bool(args.spread),
        "pre_growth_val": [round(float(v), 4) for v in val_acc],
    }
    print("pre-growth val:", out["pre_growth_val"], flush=True)

    big = grow_bond(mps, args.grow_to)
    out["post_growth_val"] = round(float(evaluate_accuracy(big, vl)), 4)
    print("post-growth val:", out["post_growth_val"], flush=True)

    cfg = SweepConfig(
        act_fn="linear", loss_fn="MSE", L2_flag=False,
        split_mode="canonical", svd_method=method,
        norm_spread=bool(args.spread),
    )
    batches = tl.batches()
    sweeps = []
    cur = big
    for k in range(args.sweeps):
        xb, yb = next(batches)
        phi = psi_embed(jnp.asarray(xb, dtype=cur.dtype))
        yb = jnp.asarray(np.asarray(yb))
        y1h = jnp.zeros((10, yb.shape[0]), dtype=cur.dtype)
        y1h = y1h.at[yb, jnp.arange(yb.shape[0])].set(1.0)

        # in-sweep pre-update forward on this batch = what the trainer
        # prints as this batch's train accuracy (state after k sweeps)
        cur, f0, _, _ = sweep_once(cur, phi, y1h, 0.1, 1e-5, cfg)
        f_direct = mps_forward(cur, phi)
        rec = {
            "sweep": k + 1,
            "l_pos_after": int(cur.l_pos),
            "pre_sweep_insweep_acc": round(
                float(accuracy_from_scores(f0, yb)), 4
            ),
            "post_sweep_direct_acc_same_batch": round(
                float(accuracy_from_scores(f_direct, yb)), 4
            ),
            "post_sweep_val": round(float(evaluate_accuracy(cur, vl)), 4),
            "finite_sites": bool(jnp.isfinite(cur.sites).all()),
            "finite_label": bool(jnp.isfinite(cur.label_site).all()),
            "max_site": float(jnp.abs(cur.sites).max()),
            "max_label": float(jnp.abs(cur.label_site).max()),
            "max_scores": float(jnp.abs(f_direct).max()),
            "finite_scores": bool(jnp.isfinite(f_direct).all()),
        }
        sweeps.append(rec)
        print(rec, flush=True)
    out["sweeps"] = sweeps

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
