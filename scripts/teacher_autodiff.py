#!/usr/bin/env python
"""Autodiff (Adam) whole-chain training on the pm0 teacher task.

VERDICT r4 item 4 (gate: test >= 0.9 on pure entangled labels). Greedy
bond-local sweeps sit at chance on pm0, brick-wall block-Jacobi peaks
~0.46-0.62, and the linear probe ceilings at 0.52-0.73 -- all measured
(results/teacher_pm0.json). The remaining framework-native lever is
GLOBAL optimisation: differentiate through the whole chain contraction
(mps_forward is one jittable scan) and let Adam move every tensor
simultaneously -- no stale environments, no bond-local greediness, no
class-mean foothold required. Optionally warm-start at the linear probe
(models/probe_init.py).

This is a capability the reference cannot express (NumPy, no autodiff;
SURVEY.md L2) and the TPU-first counterpart of its report's open
question on entangled-label learnability.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--M", type=int, default=16)
    ap.add_argument("--L", type=int, default=10)
    ap.add_argument("--teacher_m", type=int, default=4)
    ap.add_argument("--margin", type=float, default=0.3)
    ap.add_argument("--n_train", type=int, default=2048)
    ap.add_argument("--n_epochs", type=int, default=200)
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--wd", type=float, default=0.0,
                    help="adamw decoupled weight decay")
    ap.add_argument("--init", choices=["probe", "cold"], default="probe")
    ap.add_argument("--precision", default="default",
                    help="jax matmul precision for train/eval steps "
                         "(e.g. float32 to rule out bf16 MXU noise as "
                         "the optimization ceiling)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--ft_lr", type=float, default=None,
                    help="two-site finetune lr (default 0.3/N)")
    ap.add_argument("--finetune", type=int, default=0,
                    help="two-site DMRG epochs from the Adam-trained "
                         "model (greedy sweeps fail from product init "
                         "on pm0; from a gradient-trained init they "
                         "get a non-trivial basin to refine)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tensornetworkforml_tpu.data.teacher import teacher_task
    from tensornetworkforml_tpu.models.mps import mps_forward, product_init
    from tensornetworkforml_tpu.models.probe_init import probe_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed

    N, M, L, B = args.N, args.M, args.L, args.B
    tr_x, tr_y, te_x, te_y = teacher_task(
        n_train=args.n_train, n_test=2048, N=N, L=L,
        teacher_m=args.teacher_m, margin=args.margin, proto_mix=0.0,
        seed=args.seed,
    )
    if args.init == "probe":
        mps, probe_acc = probe_init(tr_x, tr_y, M=M, L=L,
                                    dtype=jnp.float32)
        print(f"probe train acc {probe_acc:.4f}", flush=True)
    else:
        mps = product_init(jax.random.PRNGKey(args.seed), N=N, M=M, L=L,
                           act_fn="linear", loss_fn="MSE",
                           dtype=jnp.float32, calibration_x=tr_x[:256])
    params = {"sites": mps.sites, "label": mps.label_site}

    n_batches = args.n_train // B
    steps_total = args.n_epochs * n_batches
    sched = optax.cosine_decay_schedule(args.lr, steps_total, alpha=0.02)
    opt = (optax.adamw(sched, weight_decay=args.wd) if args.wd > 0
           else optax.adam(sched))
    opt_state = opt.init(params)

    phi_tr = psi_embed(jnp.asarray(tr_x, jnp.float32))
    y_tr = jnp.asarray(tr_y)
    phi_te = psi_embed(jnp.asarray(te_x, jnp.float32))

    def loss_fn(p, phi, y):
        m = mps.replace(sites=p["sites"], label_site=p["label"])
        f = mps_forward(m, phi)  # (L, B) logits
        logz = jax.nn.logsumexp(f, axis=0)
        ce = jnp.mean(logz - f[y, jnp.arange(y.shape[0])])
        return ce, jnp.mean(jnp.argmax(f, 0) == y)

    @jax.jit
    def step(p, s, phi, y):
        with jax.default_matmul_precision(args.precision):
            (l, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, phi, y
            )
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l, acc

    @jax.jit
    def eval_acc(p, phi, y):
        m = mps.replace(sites=p["sites"], label_site=p["label"])
        with jax.default_matmul_precision(args.precision):
            f = mps_forward(m, phi)
        return jnp.mean(jnp.argmax(f, 0) == y)

    y_te = jnp.asarray(te_y)
    rng = np.random.default_rng(args.seed)
    hist = []
    t0 = time.perf_counter()
    for ep in range(args.n_epochs):
        perm = rng.permutation(args.n_train)
        for b in range(n_batches):
            idx = perm[b * B:(b + 1) * B]
            params, opt_state, l, acc = step(
                params, opt_state, phi_tr[idx], y_tr[idx]
            )
        if (ep + 1) % 10 == 0 or ep == args.n_epochs - 1:
            te = float(eval_acc(params, phi_te, y_te))
            hist.append({"epoch": ep + 1, "train_batch_acc": float(acc),
                         "test": round(te, 4)})
            print(f"ep {ep+1}: loss {float(l):.4f} "
                  f"train {float(acc):.4f} test {te:.4f}", flush=True)
    wall = time.perf_counter() - t0

    final_test = hist[-1]["test"]
    best_test = max(h["test"] for h in hist)

    ft = None
    if args.finetune > 0:
        from tensornetworkforml_tpu.data.loader import prepare_dataset
        from tensornetworkforml_tpu.train.trainer import (
            evaluate_accuracy,
            train_model,
        )

        data = np.concatenate([tr_x, te_x])
        labels = np.concatenate([tr_y, te_y])
        tl, vl, test_l = prepare_dataset(
            data, labels, len(tr_x) / len(data), 0.05, 256, 256, 256,
            embed=False, seed=1, even_train_batches=True,
        )
        # the Adam phase optimised softmax-CE logits; fine-tune with the
        # matching activation/loss (T=1: plain softmax over the logits)
        m_ft = mps.replace(sites=params["sites"],
                           label_site=params["label"],
                           act_fn="softmax", loss_fn="cross_entropy",
                           T=1.0)
        m_ft, val_acc, _ = train_model(
            m_ft, tl, vl, lr=(args.ft_lr or 0.3 / N),
            n_epochs=args.finetune, weight_dec=1e-5, L2_flag=False,
            split_mode="canonical", svd_method="cholqr",
            renorm_envs=True, verbose=True, restarts=0,
        )
        ft_test = float(evaluate_accuracy(m_ft, test_l))
        ft = {"epochs": args.finetune,
              "val_acc": [round(float(v), 4) for v in val_acc],
              "test": round(ft_test, 4)}
        print("finetune twosite ->", ft, flush=True)
    out = {
        "task": f"teacher pm0 N={N} teacher_m={args.teacher_m} "
                f"margin={args.margin} L={L}",
        "config": dict(M=M, B=B, lr=args.lr, n_epochs=args.n_epochs,
                       n_train=args.n_train, init=args.init,
                       opt="adam+cosine", loss="softmax-CE",
                       seed=args.seed),
        "final_test": final_test, "best_test": best_test,
        "wall_s": round(wall, 1), "history": hist,
    }
    if ft is not None:
        out["finetune_twosite"] = ft
    path = args.out or f"/root/repo/results/teacher_autodiff_N{N}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("final_test", "best_test", "wall_s")}), flush=True)


if __name__ == "__main__":
    main()
