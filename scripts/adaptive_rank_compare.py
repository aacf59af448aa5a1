#!/usr/bin/env python
"""Adaptive bond rank vs fixed-M vs bond-schedule growth (VERDICT r4
item 5: the comparison the reference's dead code never ran,
``Network_class.py:870-891``).

Three ways to manage bond capacity on the same 10-class task (synthetic
28x28 stand-in, 2x2-pooled to 14x14 = N=196), same recipe otherwise:

  fixed      -- M=64 from epoch 0
  schedule   -- grow 32 -> 64 at epoch 2 (``bond_schedule``)
  adaptive   -- M=64 cap, trailing singular directions below the
                1 - adaptive_tol energy prefix zeroed per bond
                (``SweepConfig(rank_mode='adaptive')``); live ranks
                recorded from ``metrics['live_rank']``

Reports per-config: val curve, test acc, wall-clock, and for adaptive
the live-rank trajectory (mean/max over bonds per epoch). Results ->
results/adaptive_rank_compare.json + table in BENCH_NOTES.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.data.mnist import max_pool_2x2, synthetic_mnist
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.train.trainer import (
        evaluate_accuracy,
        train_model,
    )

    tr_x, tr_y, te_x, te_y = synthetic_mnist(8000, 2000, side=28, seed=3)
    tr_x, te_x = max_pool_2x2(tr_x), max_pool_2x2(te_x)
    tr_x = tr_x.reshape(len(tr_x), -1) / max(1.0, tr_x.max())
    te_x = te_x.reshape(len(te_x), -1) / max(1.0, te_x.max())
    data = np.concatenate([tr_x, te_x])
    labels = np.concatenate([tr_y, te_y])
    N, L, B, M, n_epochs = tr_x.shape[1], 10, 256, 64, 6

    on_tpu = jax.default_backend() == "tpu"
    results = {"task": f"10-class synthetic 28x28 pooled, N={N}, B={B}",
               "recipe": "product_init + canonical + lr 0.1; split = "
                         "fastest available per mode (adaptive needs a "
                         "spectrum: cholsvd; fixed/schedule: polar)",
               "points": {}}
    import sys as _sys

    modes = (_sys.argv[1].split(",") if len(_sys.argv) > 1
             else ("fixed", "schedule", "adaptive", "adaptive_tol1e-6"))
    for mode in modes:
        tol = 1e-6 if mode.endswith("1e-6") else 1e-4
        if mode.startswith("adaptive"):
            svd = "cholsvd" if on_tpu else "svd"
        else:
            svd = "polar" if on_tpu else "svd"
        tl, vl, test_l = prepare_dataset(
            data, labels, len(tr_x) / len(data), 0.1, B, 512, 512,
            embed=False, seed=0, even_train_batches=True,
        )
        x_cal, _ = next(tl.batches())
        m0 = 32 if mode == "schedule" else M
        mps = product_init(jax.random.PRNGKey(0), N=N, M=m0, L=L,
                           act_fn="linear", loss_fn="MSE",
                           dtype=jnp.float32, calibration_x=x_cal[:256])
        t0 = time.perf_counter()
        mps, val_acc, var_hist = train_model(
            mps, tl, vl, lr=0.1, n_epochs=n_epochs, weight_dec=1e-5,
            L2_flag=False, split_mode="canonical", svd_method=svd,
            rank_mode="adaptive" if mode.startswith("adaptive") else "fixed",
            adaptive_tol=tol, verbose=True,
            bond_schedule={2: M} if mode == "schedule" else None,
            restarts=0,
        )
        wall = time.perf_counter() - t0
        test = evaluate_accuracy(mps, test_l)

        point = {
            "val_acc": [round(float(v), 4) for v in val_acc],
            "test_acc": round(float(test), 4),
            "wall_clock_s": round(wall, 1),
        }
        if mode.startswith("adaptive"):
            # one extra metric sweep to read the converged live ranks
            from tensornetworkforml_tpu.ops.embedding import psi_embed
            from tensornetworkforml_tpu.train.sweep import (
                SweepConfig, sweep_once,
            )

            cfg = SweepConfig(act_fn="linear", loss_fn="MSE",
                              L2_flag=False, split_mode="canonical",
                              svd_method=svd, rank_mode="adaptive",
                              adaptive_tol=tol)
            x_b, y_b = next(tl.batches())
            phi = psi_embed(jnp.asarray(x_b, jnp.float32))
            y1h = jnp.asarray(np.eye(L, dtype=np.float32)[y_b].T)
            *_, metrics = sweep_once(mps, phi, y1h, 0.001, 1e-5, cfg)
            lr_series = np.asarray(metrics["live_rank"])
            point["live_rank"] = {
                "mean": round(float(lr_series.mean()), 1),
                "max": int(lr_series.max()),
                "min": int(lr_series.min()),
                "cap": M,
            }
            live_ranks = lr_series.tolist()
            point["live_rank_per_bond"] = live_ranks
        results["points"][mode] = point
        print(mode, {k: v for k, v in point.items()
                     if k != "live_rank_per_bond"}, flush=True)

    results["backend"] = jax.default_backend()
    out_p = "/root/repo/results/adaptive_rank_compare.json"
    if os.path.exists(out_p):  # merge partial (subset) runs
        old = json.load(open(out_p))
        old.get("points", {}).update(results["points"])
        results["points"] = old.get("points", results["points"])
    with open(out_p, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({m: results["points"][m]["test_acc"]
                      for m in results["points"]}), flush=True)


if __name__ == "__main__":
    main()
