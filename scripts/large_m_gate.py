#!/usr/bin/env python
"""M >= 256 traveling-label LEARNING gate (round-3 item 3).

Round 2 root-caused and fixed the M >= 256 zeroing (column-scaled
Cholesky ridge) and the init output-scale guard, but only verified
FINITENESS over 6 sweeps -- no M >= 256 run had matched smaller-M
accuracy. This runs the 10-class two-site canonical recipe THROUGH THE
CLI at M=64 and M=256 on the pooled synthetic task (the VERDICT's gate),
plus the harder teacher task at both widths for a non-saturating
comparison. Writes results/large_m_gate.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cli_run(M, n_epochs=4, extra=()):
    from tensornetworkforml_tpu.cli.training_mnist import main

    out = f"/tmp/m{M}_gate.npz"
    val_acc, test_acc = main([
        "--synthetic", "--pool", "--M", str(M), "--n_epochs", str(n_epochs),
        "--batch_size", "256", "--out", out, *extra,
    ])
    return {"val_acc": [round(float(v), 4) for v in val_acc],
            "test_acc": round(float(test_acc), 4)}


def teacher_run(M, renorm=False, n_epochs=8):
    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.data.teacher import teacher_task
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.train.trainer import (
        evaluate_accuracy,
        train_model,
    )

    tr_x, tr_y, te_x, te_y = teacher_task(
        n_train=4096, n_test=1024, N=196, L=10, teacher_m=3, margin=0.5,
        proto_mix=0.3, seed=0,
    )
    data = np.concatenate([tr_x, te_x])
    labels = np.concatenate([tr_y, te_y])
    tl, vl, test_l = prepare_dataset(
        data, labels, 0.8, 0.125, 256, 256, 256, embed=False, seed=1,
        even_train_batches=True,
    )
    x_cal, _ = next(tl.batches())
    mps = product_init(jax.random.PRNGKey(0), N=196, M=M, L=10,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                       calibration_x=x_cal[:256])
    mps, val_acc, _ = train_model(
        mps, tl, vl, lr=0.1, n_epochs=n_epochs, weight_dec=1e-5,
        L2_flag=False, split_mode="canonical", svd_method="cholqr",
        renorm_envs=renorm, verbose=True, warmup_epochs=1,
    )
    test = evaluate_accuracy(mps, test_l)
    core = float(jnp.max(jnp.abs(mps.label_site)))
    return {"val_acc": [round(float(v), 4) for v in val_acc],
            "test_acc": round(float(test), 4),
            "core_max": core,
            "finite": bool(jnp.isfinite(mps.sites).all()
                           and jnp.isfinite(mps.label_site).all())}


def main():
    import jax

    if os.environ.get("TNML_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    out = {}
    for M in (64, 256):
        out[f"cli_blob_M{M}"] = cli_run(M)
        print(f"cli_blob_M{M} ->", out[f"cli_blob_M{M}"], flush=True)
    for M in (32, 256):
        out[f"teacher_M{M}"] = teacher_run(M)
        print(f"teacher_M{M} ->", out[f"teacher_M{M}"], flush=True)
    if not out["teacher_M256"]["finite"] or (
        out["teacher_M256"]["test_acc"] < out["teacher_M32"]["test_acc"] - 0.02
    ):
        out["teacher_M256_renorm"] = teacher_run(256, renorm=True)
        print("teacher_M256_renorm ->", out["teacher_M256_renorm"],
              flush=True)

    with open("/root/repo/results/large_m_gate.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
