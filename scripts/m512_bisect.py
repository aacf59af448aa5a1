#!/usr/bin/env python
"""Bisect the M=512 post-growth collapse (m512 quality gate).

Measured so far: val 1.0 -> 0.10 right after grow_bond(128 -> 512), with
factored update ON and OFF, matmul precision bf16 and f32, fused-epoch
and per-batch paths -- all identical. This script isolates the remaining
suspects from one shared trained state:

  A. grow_bond + forward at M=512 (growth is zero-padding and must be
     exactly function-preserving);
  B. ONE sweep at M=512 per split method from the same grown state.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--methods", default="polar")
    ap.add_argument("--grow_to", type=int, default=512)
    ap.add_argument("--out", default="/root/repo/results/m512_bisect.json")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from quality_gates import _make_data_for
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.data.mnist import max_pool_2x2
    from tensornetworkforml_tpu.models.mps import grow_bond, product_init
    from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once
    from tensornetworkforml_tpu.train.trainer import (
        evaluate_accuracy,
        train_model,
    )

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
    # epochs 0-3 of the gate (growth to 128 at ep2); all cached programs
    mps, val_acc, _ = train_model(
        mps, tl, vl, lr=0.1, n_epochs=4, weight_dec=1e-5, L2_flag=False,
        split_mode="canonical",
        svd_method="polar" if not args.cpu else "cholqr",
        verbose=False, warmup_epochs=1, bond_schedule={2: 128},
        restarts=0,
    )
    out = {"pre_growth_val": [round(float(v), 4) for v in val_acc],
           "backend": jax.default_backend()}
    print("pre-growth val:", out["pre_growth_val"], flush=True)

    big = grow_bond(mps, args.grow_to)
    out["post_growth_val"] = round(float(evaluate_accuracy(big, vl)), 4)
    print("post-growth (no update) val:", out["post_growth_val"],
          flush=True)

    xb, yb = next(tl.batches())
    from tensornetworkforml_tpu.models.mps import (
        accuracy_from_scores,
        mps_forward,
    )
    from tensornetworkforml_tpu.ops.embedding import psi_embed

    phi = psi_embed(jnp.asarray(xb))
    yb = jnp.asarray(yb)
    y1h = jnp.zeros((10, yb.shape[0]), dtype=big.dtype)
    y1h = y1h.at[yb, jnp.arange(yb.shape[0])].set(1.0)

    # direct forward of the grown model on one batch (no loader, no
    # fused-eval program): isolates mps_forward itself
    f_direct = mps_forward(big, phi)
    out["post_growth_batch_acc_direct"] = round(
        float(accuracy_from_scores(f_direct, yb)), 4
    )
    out["post_growth_scores_finite"] = bool(jnp.isfinite(f_direct).all())
    out["post_growth_scores_max"] = float(jnp.abs(f_direct).max())
    print("direct forward:", {k: out[k] for k in (
        "post_growth_batch_acc_direct", "post_growth_scores_finite",
        "post_growth_scores_max")}, flush=True)

    for method in args.methods.split(","):
        if not method:
            continue
        cfg = SweepConfig(
            act_fn="linear", loss_fn="MSE", L2_flag=False,
            split_mode="canonical", svd_method=method,
        )
        m2, f0, _, metrics = sweep_once(big, phi, y1h, 0.1, 1e-5, cfg)
        key = f"one_sweep_{method}"
        out[key] = {
            "f0_acc": round(float(accuracy_from_scores(f0, yb)), 4),
            "val": round(float(evaluate_accuracy(m2, vl)), 4),
            "finite_sites": bool(jnp.isfinite(m2.sites).all()),
            "finite_label": bool(jnp.isfinite(m2.label_site).all()),
            "max_site": float(jnp.abs(m2.sites).max()),
            "max_label": float(jnp.abs(m2.label_site).max()),
        }
        print(key, "->", out[key], flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
