#!/usr/bin/env python
"""Self-contained reference-recipe divergence evidence (round-3 item 8).

Runs the REFERENCE's exact configuration (random init + output
calibration, shared-sqrt(S) split, softmax + full cross-entropy, M=3,
lr=0.001 -- ``cli/training_binary_MNIST.py --recipe reference``) at
N=196/float32 on this framework's engine, with the debug metric series,
next to the TPU recipe on the SAME data -- so the claim "the reference
recipe fails where ours learns" is this framework's own measurement, not
a citation of the authors' report (section VI).

Prints per-epoch val accuracy and the per-sweep debug series' envelope
(mean|f|, mean|B|) for both recipes; writes results/divergence_evidence.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("TNML_CPU"):  # logic check off-TPU
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from tensornetworkforml_tpu.cli.common import load_binary_mnist
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.models.mps import mps_init, product_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.trainer import (
        evaluate_accuracy,
        train_model,
    )

    data, labels = load_binary_mnist("datasets", synthetic=True)
    out = {}
    for recipe in ("reference", "tpu"):
        tl, vl, test_l = prepare_dataset(
            data, labels, 0.9, 0.2, len(data) * 9 // 10 // 10, 64, 128,
            embed=False, seed=0, even_train_batches=True,
        )
        x_cal, _ = next(tl.batches())
        if recipe == "reference":
            mps = mps_init(
                jax.random.PRNGKey(0), N=196, M=3, L=2, normalize=True,
                calibration_phi=psi_embed(
                    jnp.asarray(x_cal[:16], dtype=jnp.float32)
                ),
                act_fn="softmax", loss_fn="full_cross_ent",
                dtype=jnp.float32,
            )
            mps, val_acc, var_hist = train_model(
                mps, tl, vl, lr=0.001, n_epochs=3, weight_dec=1e-56,
                L2_flag=True, debug=True, verbose=True,
            )
        else:
            mps = product_init(
                jax.random.PRNGKey(0), N=196, M=8, L=2, act_fn="linear",
                loss_fn="MSE", dtype=jnp.float32, calibration_x=x_cal,
            )
            mps, val_acc, var_hist = train_model(
                mps, tl, vl, lr=0.05, n_epochs=3, weight_dec=1e-4,
                L2_flag=False, split_mode="canonical", svd_method="cholqr",
                debug=True, verbose=True,
            )
        test = evaluate_accuracy(mps, test_l)
        series = {}
        try:
            # debug var_hist epochs are ordered by trainer._DEBUG_SERIES:
            # (mean_abs_B, mean_abs_deltaB, accuracy, mean_abs_f, MAE, ...)
            f_series = np.concatenate(
                [np.asarray(e[3]).ravel() for e in var_hist]
            )
            b_series = np.concatenate(
                [np.asarray(e[0]).ravel() for e in var_hist]
            )
            series = {
                "mean_abs_f_first_last_max": [
                    float(f_series[0]), float(f_series[-1]),
                    float(np.nanmax(f_series)),
                ],
                "mean_abs_B_first_last_max": [
                    float(b_series[0]), float(b_series[-1]),
                    float(np.nanmax(b_series)),
                ],
                "nonfinite_f_steps": int((~np.isfinite(f_series)).sum()),
            }
        except Exception as e:
            series = {"series_error": repr(e)[:200]}
        out[recipe] = {
            "val_acc": [round(float(v), 4) for v in val_acc],
            "test_acc": round(float(test), 4),
            **series,
        }
        print(recipe, "->", out[recipe], flush=True)

    with open("/root/repo/results/divergence_evidence.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
