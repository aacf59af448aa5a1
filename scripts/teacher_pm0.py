#!/usr/bin/env python
"""Teacher-task learnability push (VERDICT-r3 item 8): proto_mix=0.

Round 3 recorded that PURE entangled teacher labels (proto_mix=0 -- no
class-mean prototype channel) are unlearnable by the greedy sequential
recipes from product init, and the trainer benchmark showed the
brick-wall block-Jacobi trainer is the only family that solves the
pm=0.3 variant (test 0.999 where sweeps plateau at ~0.8,
BENCH_NOTES.md round-3 trainer table). This script runs the candidate
fixes on the pm=0 task and records the outcome:

* brickwall at the production rate (the pm=0.3 winner),
* brickwall with line search (auto step),
* two-site sweeps for the baseline plateau,
* optional bigger student / longer budget via flags.

CPU by default (keeps the real chip free); --tpu runs on hardware.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--N", type=int, default=196)
    ap.add_argument("--M", type=int, default=32)
    ap.add_argument("--L", type=int, default=10)
    ap.add_argument("--teacher_m", type=int, default=4)
    ap.add_argument("--margin", type=float, default=0.3)
    ap.add_argument("--n_train", type=int, default=4096)
    ap.add_argument("--n_epochs", type=int, default=16)
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--trainers", type=str,
                    default="brickwall,brickwall_ls,twosite")
    ap.add_argument("--lr_decay", type=float, default=1.0,
                    help="per-epoch lr multiplier for the brick path "
                         "(constant-rate brick training decays after its "
                         "peak on this task -- measured)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.data.teacher import teacher_task
    from tensornetworkforml_tpu.models.boundary import (
        boundary_forward,
        boundary_product_init,
    )
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.brickwall import (
        BrickConfig,
        train_brickwall,
    )
    from tensornetworkforml_tpu.train.trainer import (
        evaluate_accuracy,
        train_model,
    )

    tr_x, tr_y, te_x, te_y = teacher_task(
        n_train=args.n_train, n_test=1024, N=args.N, L=args.L,
        teacher_m=args.teacher_m, margin=args.margin, proto_mix=0.0,
        seed=args.seed,
    )
    data = np.concatenate([tr_x, te_x])
    labels = np.concatenate([tr_y, te_y])
    tl, vl, test_l = prepare_dataset(
        data, labels, len(tr_x) / len(data), 0.125, args.B, 256, 256,
        embed=False, seed=1, even_train_batches=True,
    )
    x_cal, _ = next(tl.batches())
    N, L, M = args.N, args.L, args.M

    def eval_boundary(model, loader):
        accs = []
        for x_t, y_t in loader.batches():
            scores = boundary_forward(
                model, psi_embed(jnp.asarray(x_t, dtype=jnp.float32)))
            accs.append(float(jnp.mean(
                jnp.argmax(scores, 0) == jnp.asarray(y_t))))
        return float(np.mean(accs))

    results = {}
    for name in args.trainers.split(","):
        if name.startswith("brickwall"):
            bcfg = BrickConfig(act_fn="linear", loss_fn="MSE",
                               split_method="cholqr",
                               line_search=name.endswith("_ls"))
            model = boundary_product_init(
                jax.random.PRNGKey(args.seed), N=N, M=M, L=L,
                act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                calibration_x=x_cal[:256])
            lr0 = min(0.02, 0.5 / N)
            lr_arg = (lr0 if args.lr_decay == 1.0
                      else (lambda e, _l=lr0, _d=args.lr_decay: _l * _d ** e))
            model, val_acc = train_brickwall(
                model, tl, vl, lr=lr_arg,
                n_epochs=args.n_epochs, weight_dec=1e-5, verbose=False,
                cfg=bcfg)
            test_acc = eval_boundary(model, test_l)
        elif name == "twosite":
            model = product_init(
                jax.random.PRNGKey(args.seed), N=N, M=M, L=L,
                act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                calibration_x=x_cal[:256])
            model, val_acc, _ = train_model(
                model, tl, vl, lr=min(0.2, 1.6 / N),
                n_epochs=args.n_epochs, weight_dec=1e-5, L2_flag=False,
                split_mode="canonical", svd_method="cholqr",
                verbose=False)
            test_acc = evaluate_accuracy(model, test_l)
        else:
            raise ValueError(name)
        results[name] = {
            "val_acc": [round(float(v), 4) for v in val_acc],
            "best_val": round(max(float(v) for v in val_acc), 4),
            "test_acc": round(float(test_acc), 4),
        }
        print(name, results[name]["val_acc"], "test",
              results[name]["test_acc"], flush=True)

    out = {
        "task": ("teacher proto_mix=0 (pure entangled labels), "
                 f"N={N} L={L} teacher_m={args.teacher_m} "
                 f"margin={args.margin} n_train={args.n_train}"),
        "student_M": M,
        "n_epochs": args.n_epochs,
        "B": args.B,
        "backend": "tpu" if args.tpu else "cpu",
        "results": results,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: v["test_acc"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
