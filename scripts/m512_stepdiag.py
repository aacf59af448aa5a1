#!/usr/bin/env python
"""Per-step diagnosis of the M=512 post-growth scale blow-up (CPU).

The m512 bisect showed one post-growth sweep leaves max|label| ~ 2.7e9
on BOTH the TPU polar and CPU cholqr paths while val stays 1.0 --
accuracy is argmax-scale-invariant, so that number cannot distinguish
(a) junk injected into dead bond directions from (b) a global function
scale inflation. This script runs the same post-growth sweep with
step_metrics=True and records the per-step series (sum|B|, sum|dB|,
mean|f|) plus the from-scratch score scale after the sweep, at
grow_to in {128(control), 256, 512}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
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
        split_mode="canonical", svd_method="cholqr",
        verbose=False, warmup_epochs=1, bond_schedule={2: 128}, restarts=0,
    )
    print("pre-growth val:", [round(float(v), 4) for v in val_acc],
          flush=True)

    xb, yb = next(tl.batches())
    phi = psi_embed(jnp.asarray(xb))
    yb = jnp.asarray(yb)
    y1h = jnp.zeros((10, yb.shape[0]), dtype=mps.dtype)
    y1h = y1h.at[yb, jnp.arange(yb.shape[0])].set(1.0)

    out = {}
    for grow_to in (128, 256, 512):
        big = grow_bond(mps, grow_to) if grow_to > 128 else mps
        cfg = SweepConfig(
            act_fn="linear", loss_fn="MSE", L2_flag=False,
            split_mode="canonical", svd_method="cholqr", step_metrics=True,
        )
        m2, f0, _, metrics = sweep_once(big, phi, y1h, 0.1, 1e-5, cfg)
        sB = np.asarray(metrics["mean_abs_B"], dtype=np.float64)
        sdB = np.asarray(metrics["mean_abs_deltaB"], dtype=np.float64)
        mf = np.asarray(metrics["mean_abs_f"], dtype=np.float64)
        f_scratch = mps_forward(m2, phi)
        rec = {
            "val": round(float(evaluate_accuracy(m2, vl)), 4),
            "max_label": float(jnp.abs(m2.label_site).max()),
            "scores_max_after": float(jnp.abs(f_scratch).max()),
            "acc_after": round(float(accuracy_from_scores(f_scratch, yb)), 4),
            # per-step growth factor of sum|B| along the sweep: the merged
            # two-site tensor carries the traveling core, so its trend IS
            # the network scale trend under the renorm gauge
            "mean_abs_B_first8": [round(float(v), 3) for v in sB[:8]],
            "mean_abs_B_last8": [round(float(v), 3) for v in sB[-8:]],
            "mean_abs_dB_first8": [round(float(v), 3) for v in sdB[:8]],
            "mean_abs_f_first8": [round(float(v), 4) for v in mf[:8]],
            "mean_abs_f_last8": [round(float(v), 4) for v in mf[-8:]],
            "geo_growth_per_step_B": round(
                float((sB[-1] / max(sB[0], 1e-30)) ** (1.0 / max(len(sB) - 1, 1))), 5
            ),
            "clip_active_frac": round(float(np.mean(sdB > sB)), 4),
        }
        out[f"grow_{grow_to}"] = rec
        print(f"grow_{grow_to}:", json.dumps(rec), flush=True)

    with open("/root/repo/results/m512_stepdiag.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
