"""Train the MPS classifier on full 10-class MNIST (28x28 or pooled 14x14).

A configuration the reference never supported (it stops at pooled binary
MNIST and its report, section VI, records the algorithm failing even
there); this is the BASELINE.json north-star config family: 10-class MNIST,
label-leg MPS, bond dim 20-50+.

    python -m tensornetworkforml_tpu.cli.training_mnist --data_dir datasets
    python -m tensornetworkforml_tpu.cli.training_mnist --synthetic --pool

Recipe: per-site-calibrated product-state init + canonical-gauge two-site
sweeps + linear activation / MSE loss (see ``models/mps.py::product_init``).
MNIST is read from local IDX files; ``--synthetic`` substitutes the
deterministic stand-in.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train the Tensor Network on 10-class MNIST"
    )
    p.add_argument("--data_dir", type=str, default="datasets")
    p.add_argument("--dataset", type=str, default="mnist",
                   choices=["mnist", "fashion", "cifar10"],
                   help="mnist/fashion share the IDX loader (Fashion-MNIST "
                        "ships the same file names); cifar10 reads the "
                        "binary batches as 32x32 grayscale")
    p.add_argument("--pool", action="store_true", default=True,
                   help="2x2 max-pool (default; 28x28 -> 14x14)")
    p.add_argument("--full", dest="pool", action="store_false",
                   help="train on the full-resolution chain (N=784/1024; "
                        "EXPERIMENTAL: long-chain DMRG optimisation is "
                        "oscillatory, see ROADMAP.md)")
    p.add_argument("--M", type=int, default=32, help="Bond dimension")
    p.add_argument("--n_epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=128,
                   help="quality tracks UPDATE count, not batch size: when "
                        "growing B by k, run ~k x the epochs and raise "
                        "--lr_decay to decay^(1/k) (measured: B=1024 on "
                        "the B=256 schedule tests 0.91, update-matched "
                        "parity -- results/large_batch_quality.json)")
    p.add_argument("--lr", type=float, default=None,
                   help="default 0.2; 1.6/N for chains longer than 400 "
                        "sites -- the clipped update takes a ~lr-relative "
                        "step at EVERY bond, so per-sweep function growth "
                        "compounds like (1+lr)^N and lr must scale as 1/N "
                        "(measured: 0.002 holds stable 1.0 val at N=784 "
                        "where 0.03 explodes by sweep 3)")
    p.add_argument("--lr_decay", type=float, default=None,
                   help="per-epoch geometric lr decay for the two-site "
                        "trainer (lr * decay^epoch). Default: 1.0 (off) "
                        "below bond dimension 64, 0.6 at M >= 64 -- the "
                        "greedy bond optimisation converges in 1-2 epochs "
                        "at large M and further full-rate sweeps walk the "
                        "model out of the optimum (measured M=64: val "
                        "1.0 -> 0.19 by epoch 5 without decay)")
    p.add_argument("--weight_dec", type=float, default=1e-5)
    p.add_argument("--act_fn", type=str, default="linear")
    p.add_argument("--loss_fn", type=str, default="MSE")
    p.add_argument("--out", type=str, default="trained_mnist10_model.npz")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--dp", action="store_true",
                   help="Shard the batch over all devices (data parallel)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Path for per-epoch training-state checkpoints")
    p.add_argument("--resume", action="store_true",
                   help="Resume from --checkpoint if it exists")
    p.add_argument("--bond_schedule", type=str, default=None,
                   help='grow the bond dimension mid-training, e.g. '
                        '"2:32,4:64" grows M to 32 at epoch 2 and 64 at '
                        'epoch 4 (zero-padded embedding, function '
                        'preserved exactly; one re-jit per growth)')
    p.add_argument("--stall_threshold", type=float, default=0.95,
                   help="validation accuracy above which a run is never "
                        "flagged stalled (restart gate). LOWER this (or "
                        "pass --restarts 0) on tasks whose attainable "
                        "accuracy is below 0.95, otherwise every attempt "
                        "is aborted as 'stalled' and the restart budget "
                        "is burned on a healthy run")
    p.add_argument("--restarts", type=int, default=None,
                   help="max fresh-init retries when validation stalls "
                        "below --stall_threshold (init-basin escape; see "
                        "train_model docstring). Default: 2 when "
                        "batch_size > 128 (the regime with a measured "
                        "~1-in-5 stuck-seed rate), else 0")
    p.add_argument("--warmup_epochs", type=int, default=None,
                   help="epochs at a small (~128-sample) batch before the "
                        "full batch (default: 1 when batch_size > 128, else "
                        "0). Large clean batches settle into init-dependent "
                        "attractors of the greedy bond optimisation; one "
                        "small-batch epoch restores the small-batch basin "
                        "(B=256 seed spread 0.20 -> 0.04; B=1024 test "
                        "0.71 -> 0.97 vs a half-batch warmup)")
    p.add_argument("--svd_method", type=str, default="cholqr",
                   choices=["svd", "rangefinder", "cholsvd", "cholqr",
                            "polar"],
                   help="two-site split backend: cholqr (default) is the "
                        "matmul/Cholesky-only subspace split -- fastest "
                        "measured sweeps (3-5x rangefinder at M>=64) with "
                        "equivalent accuracy; NOTE its f32 validity domain "
                        "is a kept spectral block spanning <= ~3 decades "
                        "(directions below ~1e-3 of sigma_max are "
                        "annihilated) -- use rangefinder (qr+eigh subspace "
                        "split, no such limit) or svd (exact) for "
                        "wide-spectrum regimes; polar is the fused Pallas "
                        "kernel split (2.1x faster sweeps than cholqr at "
                        "M=128 on TPU, equivalent capture/isometry)")
    p.add_argument("--renorm_envs", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="norm-transfer gauge for canonical two-site "
                        "sweeps: rescale the carried left environment to "
                        "unit mean norm each step, absorbing the factor "
                        "into the label core. 'auto' (default) enables it "
                        "for long chains (N > 400) OR bond dimension "
                        ">= 64: without it the label core runs hot at "
                        "large M (measured 2.4e3..4.7e4 by sweep 8 at "
                        "M >= 64, chance-level accuracy; with it M=256 "
                        "reaches test 1.000, results/large_m_gate.json)")
    p.add_argument("--trainer", type=str, default="twosite",
                   choices=["twosite", "onesite", "brickwall"],
                   help="onesite: SVD-free boundary-label sweeps (~7x "
                        "faster steps; recommended with --full). "
                        "brickwall: all two-site pair updates in a layer "
                        "batched on the MXU (train/brickwall.py) -- O(1) "
                        "update depth per sweep instead of N-1 sequential "
                        "steps")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.data.mnist import (
        get_MNIST_dataset,
        max_pool_2x2,
        synthetic_mnist,
    )
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.models.network import Network
    from tensornetworkforml_tpu.train.trainer import (
        evaluate_accuracy,
        train_model,
    )

    if args.dataset == "cifar10":
        from tensornetworkforml_tpu.data.cifar import (
            get_CIFAR10_grayscale,
            synthetic_cifar10,
        )

        if args.synthetic:
            tr_x, tr_y, te_x, te_y = synthetic_cifar10()
        else:
            tr_x, tr_y, te_x, te_y = get_CIFAR10_grayscale(args.data_dir)
        scale = 1.0  # already in [0, 1]
    else:
        if args.synthetic:
            tr_x, tr_y, te_x, te_y = synthetic_mnist()
        else:
            tr_x, tr_y, te_x, te_y = get_MNIST_dataset(
                data_root_dir=args.data_dir
            )
        scale = 255.0
    n_train = len(tr_x)
    data = np.concatenate([tr_x, te_x]) / scale
    labels = np.concatenate([tr_y, te_y])
    if args.pool:
        data = max_pool_2x2(data)
    N = data[0].size

    train_perc = n_train / len(data)
    train_loader, val_loader, test_loader = prepare_dataset(
        data, labels, train_perc, 0.1,
        train_batch_size=args.batch_size, val_batch_size=256,
        test_batch_size=256, embed=False, seed=args.seed,
        even_train_batches=True,  # keep every epoch on the fused path
    )

    # long chains need the norm-transfer gauge (the label core otherwise
    # overflows float32 along a canonical sweep), a growth cap on the
    # two-site tensor, and an N-SCALED step size: the clipped two-site
    # update moves ~lr x |B| at every one of N-1 bonds, so the function
    # can compound by (1+lr)^N per sweep -- lr ~ 1.6/N bounds that to ~5x
    # (measured at N=784/M=16/f32: lr=0.002 holds 1.0 val across seeds,
    # the old 0.03 default explodes to |f|~1e13 by sweep 3)
    long_chain = N > 400
    lr = args.lr if args.lr is not None else (
        min(0.2, 1.6 / N) if long_chain else 0.2
    )
    growth_cap = 0.002 if long_chain else 0.0
    warmup_epochs = (
        args.warmup_epochs
        if args.warmup_epochs is not None
        else (1 if args.batch_size > 128 else 0)
    )
    bond_schedule = None
    if args.bond_schedule:
        bond_schedule = {
            int(e): int(m)
            for e, m in (kv.split(":") for kv in args.bond_schedule.split(","))
        }

    # norm-transfer gauge (see --renorm_envs help): auto-on for long
    # chains or large bond dimension, including schedule targets
    max_m = max([args.M, *(bond_schedule or {}).values()])
    renorm = {
        "auto": long_chain or max_m >= 64, "on": True, "off": False,
    }[args.renorm_envs]
    # large-M recipe (results/large_m_gate.json + BENCH_NOTES round 3):
    # the gauge alone is not enough -- at M >= 64 the greedy sweeps also
    # need a growth cap and per-epoch lr decay or they walk back out of
    # the epoch-1 optimum
    lr_decay = (
        args.lr_decay if args.lr_decay is not None
        else (0.6 if max_m >= 64 else 1.0)
    )
    if max_m >= 64 and args.lr is None:
        lr = min(lr, 0.02)
    if max_m >= 64 and not long_chain:
        growth_cap = growth_cap or 0.002

    x_cal, _ = next(train_loader.batches())

    if args.trainer in ("onesite", "brickwall"):
        from tensornetworkforml_tpu.models.boundary import (
            boundary_product_init,
        )
        from tensornetworkforml_tpu.train.onesite import train_boundary_model

        model = boundary_product_init(
            jax.random.PRNGKey(args.seed), N=N, M=args.M, L=10,
            act_fn=args.act_fn, loss_fn=args.loss_fn, dtype=jnp.float32,
            calibration_x=x_cal[:256],
        )
        if args.trainer == "brickwall":
            from tensornetworkforml_tpu.train.brickwall import train_brickwall

            # a brick layer takes K = N/2 SIMULTANEOUS clipped lr-relative
            # pair steps with a shared stale output (block-Jacobi), so the
            # stable rate needs lr*K <~ 0.25 -- much tighter than the
            # sequential sweeps' self-correcting Gauss-Seidel dynamics
            # (measured at N=196: lr=0.002 holds 1.0 val, 0.01 diverges;
            # BENCH_NOTES.md)
            base_lr = args.lr if args.lr is not None else min(0.02, 0.5 / N)
            from tensornetworkforml_tpu.train.brickwall import BrickConfig

            if args.svd_method not in ("cholqr", "rangefinder"):
                raise SystemExit(
                    "--trainer brickwall supports --svd_method cholqr or "
                    f"rangefinder (got {args.svd_method!r})"
                )
            bcfg = BrickConfig(act_fn=args.act_fn, loss_fn=args.loss_fn,
                               split_method=args.svd_method)
            model, val_acc = train_brickwall(
                model, train_loader, val_loader, lr=base_lr,
                n_epochs=args.n_epochs, weight_dec=args.weight_dec,
                verbose=True, bond_schedule=bond_schedule,
                checkpoint_path=args.checkpoint, resume=args.resume,
                cfg=bcfg,
            )
        else:
            base_lr = args.lr if args.lr is not None else (
                0.05 if long_chain else 0.2
            )
            # per-SWEEP geometric decay holds the fit once reached (measured:
            # stable 1.0 at N=784 across epochs; constant lr overshoots to 0.3)
            decay = 0.3 ** (1.0 / 15.0) if long_chain else 1.0
            model, val_acc = train_boundary_model(
                model, train_loader, val_loader, lr=base_lr,
                n_epochs=args.n_epochs, weight_dec=args.weight_dec,
                lr_sweep_decay=decay, verbose=True,
                checkpoint_path=args.checkpoint, resume=args.resume,
            )
        # test accuracy via the boundary forward
        from tensornetworkforml_tpu.models.boundary import boundary_forward
        from tensornetworkforml_tpu.ops.embedding import psi_embed
        import jax.numpy as _jnp

        accs = []
        for x_t, y_t in test_loader.batches():
            scores = boundary_forward(
                model, psi_embed(_jnp.asarray(x_t, dtype=_jnp.float32))
            )
            accs.append(
                float(_jnp.mean(_jnp.argmax(scores, 0) == _jnp.asarray(y_t)))
            )
        test_acc = float(np.mean(accs)) if accs else float("nan")
        print(f"\nTest accuracy: {test_acc:.4f}")
        from tensornetworkforml_tpu.utils.checkpoint import (
            save_boundary_checkpoint,
        )

        save_boundary_checkpoint(model, args.out)
        print(f"Model saved to {args.out}")
        return val_acc, test_acc

    mps = product_init(
        jax.random.PRNGKey(args.seed), N=N, M=args.M, L=10,
        act_fn=args.act_fn, loss_fn=args.loss_fn, dtype=jnp.float32,
        calibration_x=x_cal[:256],
    )

    if args.dp:
        from tensornetworkforml_tpu.parallel.dp import ShardedTrainer
        from tensornetworkforml_tpu.parallel.mesh import make_mesh

        from tensornetworkforml_tpu.train.sweep import SweepConfig

        mesh = make_mesh()
        cfg = SweepConfig(act_fn=args.act_fn, loss_fn=args.loss_fn,
                          L2_flag=False, split_mode="canonical",
                          svd_method=args.svd_method,
                          renorm_envs=renorm, growth_cap=growth_cap)
        start_epoch = 0
        if args.checkpoint and args.resume:
            import os as _os

            if _os.path.exists(args.checkpoint):
                from tensornetworkforml_tpu.utils.checkpoint import (
                    load_training_state,
                )

                mps, start_epoch = load_training_state(args.checkpoint, mps)
                if start_epoch:
                    print(f"resuming from epoch {start_epoch}")
        trainer = ShardedTrainer(
            mesh, mps, lr=lr, weight_dec=args.weight_dec, cfg=cfg,
        )
        # warmup in the SMALL-batch basin: the absolute warmup batch size
        # is the active ingredient (<= 128; see train_model docstring)
        from tensornetworkforml_tpu.data.loader import (
            warmup_batch_size,
            with_batch_size,
        )

        warm_loader = (
            with_batch_size(train_loader, warmup_batch_size(args.batch_size))
            if warmup_epochs > 0
            else None
        )
        val_acc = []
        for epoch in range(start_epoch, args.n_epochs):
            trainer.lr = lr * lr_decay ** epoch
            loader = warm_loader if epoch < warmup_epochs else train_loader
            accs = [trainer.step(x, y) for x, y in loader.batches()]
            val = evaluate_accuracy(trainer.mps, val_loader)
            val_acc.append(val)
            print(f"Epoch {epoch}: train {np.mean(accs):.4f} val {val:.4f}")
            if args.checkpoint:
                from tensornetworkforml_tpu.utils.checkpoint import (
                    save_training_state,
                )

                save_training_state(args.checkpoint, trainer.mps, epoch + 1)
        mps = trainer.mps
        var_hist = None
    else:
        lr_arg = (
            lr if lr_decay == 1.0
            else (lambda e, _lr=lr, _d=lr_decay: _lr * _d ** e)
        )
        restarts = (
            args.restarts if args.restarts is not None
            else (2 if args.batch_size > 128 else 0)
        )
        # fresh inits for stall restarts: same calibration batch, a seed
        # offset far from any user-chosen --seed range
        reinit_fn = lambda attempt: product_init(
            jax.random.PRNGKey(args.seed + 7919 * attempt), N=N, M=args.M,
            L=10, act_fn=args.act_fn, loss_fn=args.loss_fn,
            dtype=jnp.float32, calibration_x=x_cal[:256],
        )
        mps, val_acc, var_hist = train_model(
            mps, train_loader, val_loader, lr=lr_arg,
            n_epochs=args.n_epochs, weight_dec=args.weight_dec,
            L2_flag=False, split_mode="canonical",
            svd_method=args.svd_method, renorm_envs=renorm,
            growth_cap=growth_cap, checkpoint_path=args.checkpoint,
            resume=args.resume, warmup_epochs=warmup_epochs,
            bond_schedule=bond_schedule, restarts=restarts,
            reinit_fn=reinit_fn, stall_threshold=args.stall_threshold,
        )

    test_acc = evaluate_accuracy(mps, test_loader)
    print(f"\nTest accuracy: {test_acc:.4f}")

    net = Network.__new__(Network)
    net.mps = mps
    net.save(args.out)
    print(f"Model saved to {args.out}")
    return val_acc, test_acc


if __name__ == "__main__":
    main()
