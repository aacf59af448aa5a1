#!/usr/bin/env python
"""Quality-per-wall-clock benchmark: the three trainer families on the
teacher-MPS task (round-3 review item 2).

Task: ``data/teacher.py`` -- labels from a random teacher MPS, margin-
filtered, balanced; capacity- AND optimization-sensitive (does not
saturate at 1.0 like diagonals / blob-MNIST). Two difficulty presets:

* standard (teacher_m=2, margin=0.5): high accuracy reachable; measures
  seconds-to-target at 0.85/0.90.
* hard (teacher_m=4, margin=0.3): optimization-limited ~0.8 plateau;
  measures accuracy-at-budget.

Protocol per trainer (tunnel-safe, CLAUDE.md): one 1-epoch warm run from
a throwaway model populates the compile cache; the timed run then trains
a fresh model for E epochs; per-epoch seconds = total/E (host-fetch
synced by the accuracy reads inside each trainer). seconds-to-target =
per_epoch * (1 + first epoch index with val >= target).

Writes results/bench_trainers.json; prints a markdown table for
BENCH_NOTES.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_task(task_name, task_kw):
    """Return (data, labels, n_train) for a named task family."""
    import numpy as np

    if task_name.startswith("teacher"):
        from tensornetworkforml_tpu.data.teacher import teacher_task

        tr_x, tr_y, te_x, te_y = teacher_task(**task_kw)
        return (np.concatenate([tr_x, te_x]),
                np.concatenate([tr_y, te_y]), len(tr_x))
    if task_name.startswith("blob"):
        from tensornetworkforml_tpu.data.mnist import (
            max_pool_2x2,
            synthetic_mnist,
        )

        tr_x, tr_y, te_x, te_y = synthetic_mnist(
            task_kw["n_train"], task_kw["n_test"],
            noise=task_kw["noise"], seed=task_kw.get("seed", 0),
        )
        data = max_pool_2x2(
            np.concatenate([tr_x, te_x]) / 255.0
        ).reshape(len(tr_x) + len(te_x), -1)
        return data, np.concatenate([tr_y, te_y]), len(tr_x)
    raise ValueError(task_name)


def run(task_name, task_kw, trainers, n_epochs, targets, M=32, B=256,
        seed=0):
    import jax
    import jax.numpy as jnp

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
    from tensornetworkforml_tpu.train.onesite import train_boundary_model
    from tensornetworkforml_tpu.train.trainer import (
        evaluate_accuracy,
        train_model,
    )

    data, labels, n_train = make_task(task_name, task_kw)
    N = data.shape[1]
    L = int(labels.max()) + 1
    tl, vl, test_l = prepare_dataset(
        data, labels, n_train / len(data), 0.125, B, 256, 256,
        embed=False, seed=1, even_train_batches=True,
    )
    x_cal, _ = next(tl.batches())

    def eval_boundary(model, loader):
        accs = []
        for x_t, y_t in loader.batches():
            scores = boundary_forward(
                model, psi_embed(jnp.asarray(x_t, dtype=jnp.float32))
            )
            accs.append(
                float(jnp.mean(jnp.argmax(scores, 0) == jnp.asarray(y_t)))
            )
        return float(np.mean(accs))

    def fresh_mps(seed_):
        return product_init(jax.random.PRNGKey(seed_), N=N, M=M, L=L,
                            act_fn="linear", loss_fn="MSE",
                            dtype=jnp.float32, calibration_x=x_cal[:256])

    def fresh_boundary(seed_):
        return boundary_product_init(
            jax.random.PRNGKey(seed_), N=N, M=M, L=L, act_fn="linear",
            loss_fn="MSE", dtype=jnp.float32, calibration_x=x_cal[:256],
        )

    results = {}
    for name in trainers:
        if name.startswith("twosite"):
            method = name.split(":")[1] if ":" in name else "cholqr"

            def go(m, E):
                return train_model(
                    m, tl, vl, lr=0.1, n_epochs=E, weight_dec=1e-5,
                    L2_flag=False, split_mode="canonical",
                    svd_method=method, verbose=False,
                )[:2]

            warm_model, fresh, ev = fresh_mps(99), fresh_mps, None
        elif name == "onesite":

            def go(m, E):
                return train_boundary_model(
                    m, tl, vl, lr=0.2, n_epochs=E, weight_dec=1e-5,
                    lr_sweep_decay=0.98, verbose=False,
                )

            warm_model, fresh, ev = fresh_boundary(99), fresh_boundary, \
                eval_boundary
        elif name == "brickwall":
            bcfg = BrickConfig(act_fn="linear", loss_fn="MSE",
                               split_method="cholqr")
            brick_lr = min(0.02, 0.5 / N)

            def go(m, E, _c=bcfg, _lr=brick_lr):
                return train_brickwall(
                    m, tl, vl, lr=_lr, n_epochs=E, weight_dec=1e-5,
                    verbose=False, cfg=_c,
                )

            warm_model, fresh, ev = fresh_boundary(99), fresh_boundary, \
                eval_boundary
        else:
            raise ValueError(name)

        go(warm_model, 1)  # compile warm-up (throwaway model)
        model = fresh(seed)
        t0 = time.perf_counter()
        model, val_acc = go(model, n_epochs)
        # force full execution with a host fetch of the final params
        _ = float(jnp.sum(jnp.abs(model.sites if hasattr(model, "sites")
                                  else model[0])))
        total_s = time.perf_counter() - t0
        per_epoch = total_s / n_epochs
        test_acc = (
            eval_boundary(model, test_l) if ev else
            evaluate_accuracy(model, test_l)
        )
        entry = {
            "per_epoch_s": round(per_epoch, 3),
            "total_s": round(total_s, 2),
            "val_acc": [round(float(v), 4) for v in val_acc],
            "best_val": round(max(float(v) for v in val_acc), 4),
            "test_acc": round(float(test_acc), 4),
        }
        for tgt in targets:
            hit = next(
                (i for i, v in enumerate(val_acc) if float(v) >= tgt), None
            )
            entry[f"s_to_{tgt}"] = (
                round((hit + 1) * per_epoch, 2) if hit is not None else None
            )
        results[name] = entry
        print(task_name, name, "->", entry, flush=True)
    return results


def main():
    import jax

    if os.environ.get("TNML_BT_CPU"):  # logic check off-TPU
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    trainers = ["twosite:cholqr", "twosite:polar", "onesite", "brickwall"]
    only = os.environ.get("TNML_BT_ONLY")
    if only:
        trainers = only.split(",")
    epochs = int(os.environ.get("TNML_BT_EPOCHS", "20"))

    out = {}
    # seconds-to-target: multi-epoch learnable task (heavy-noise blobs,
    # N=196 pooled, reachable ~0.96 by the two-site recipe)
    out["blob_noise0.6"] = run(
        "blob_noise0.6",
        dict(n_train=4096, n_test=1024, noise=0.6, seed=0),
        trainers, n_epochs=epochs, targets=(0.9, 0.95),
    )
    if not os.environ.get("TNML_BT_SKIP_HARD"):
        # quality-at-budget stress case: entangled teacher labels with a
        # 0.3 prototype channel (two-site plateau ~0.70; discriminates
        # what each trainer can extract beyond the rank-1 channel)
        out["teacher_pm0.3"] = run(
            "teacher_pm0.3",
            dict(n_train=4096, n_test=1024, N=196, L=10, teacher_m=3,
                 margin=0.5, proto_mix=0.3, seed=0),
            trainers, n_epochs=epochs, targets=(0.6, 0.7),
        )

    path = "/root/repo/results/bench_trainers.json"
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    for k, v in out.items():
        merged.setdefault(k, {}).update(v)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)

    # markdown table
    for task, res in out.items():
        print(f"\n### {task}")
        print("| trainer | s/epoch | best val | test | " +
              " | ".join(k for k in next(iter(res.values()))
                         if k.startswith("s_to")) + " |")
        print("|---" * (4 + sum(1 for k in next(iter(res.values()))
                                if k.startswith("s_to"))) + "|")
        for name, e in res.items():
            stos = " | ".join(
                str(e[k]) for k in e if k.startswith("s_to")
            )
            print(f"| {name} | {e['per_epoch_s']} | {e['best_val']} | "
                  f"{e['test_acc']} | {stos} |")


if __name__ == "__main__":
    main()
