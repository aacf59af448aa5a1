"""Regression tests for advisor findings (ADVICE.md, rounds 1-4).

Round 1:
1. matmul_precision is honored on the fused-epoch and sharded-step paths.
2. train_model/Trainer expose the matmul_precision knob.
3. canonical split with a traced `keep` must not leak weight into bond
   slots beyond the kept rank (U's columns are zeroed too).
4. --checkpoint/--resume work on the CLI's --dp and onesite paths.

Round 4 (tests at the bottom of the file):
5. _tile_j's max_bytes is BYTES (default 2 MB) and blocks respect it.
6. brick line-search floor applies only in the num <= 0 stall regime.
7. multi-attempt train_model re-saves the WINNING attempt's checkpoint.
8. ShardedTrainer rejects L2_flag=True combined with dist_split.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (forces the CPU backend before jax)
import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.data.loader import ArrayLoader, NumpyDataset
from tensornetworkforml_tpu.models.mps import mps_init, product_init
from tensornetworkforml_tpu.ops.svd import truncated_svd_split
from tensornetworkforml_tpu.train.trainer import Trainer, train_model


def _toy_loaders(N=8, B=8, n_batches=4, L=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((n_batches * B, N))
    y = rng.integers(0, L, n_batches * B)
    ds = NumpyDataset(x, y)
    return ArrayLoader(ds, batch_size=B), ArrayLoader(ds, batch_size=B)


def test_canonical_keep_zeroes_left_factor_columns():
    rng = np.random.default_rng(1)
    bmat = jnp.asarray(rng.standard_normal((6, 12)))
    keep = jnp.asarray(3)
    for method in ("svd", "cholsvd", "gram"):
        if method == "gram":
            # gram canonical path requires wide input; same as others here
            pass
        U, SVh = truncated_svd_split(
            bmat, rank=6, method=method, keep=keep, split_mode="canonical"
        )
        # columns (U) and rows (SVh) beyond `keep` must be exactly zero --
        # otherwise later merges re-activate truncated bond slots
        assert np.allclose(np.asarray(U)[:, 3:], 0.0), method
        assert np.allclose(np.asarray(SVh)[3:, :], 0.0), method
        # the product still reproduces the best rank-3 approximation
        full_U, full_S, full_Vh = np.linalg.svd(
            np.asarray(bmat), full_matrices=False
        )
        best3 = (full_U[:, :3] * full_S[:3]) @ full_Vh[:3]
        assert np.allclose(np.asarray(U @ SVh), best3, atol=1e-8), method


def test_train_model_matmul_precision_kwarg():
    train_loader, val_loader = _toy_loaders()
    mps = mps_init(jax.random.PRNGKey(0), N=8, M=4, L=3,
                   act_fn="softmax", loss_fn="cross_entropy",
                   dtype=jnp.float32)
    # On CPU the precision knob is a numerical no-op but the code path
    # (wrapping the fused epoch body) must trace and run.
    _, val_acc, _ = train_model(
        mps, train_loader, val_loader, lr=0.05, n_epochs=1,
        matmul_precision="float32", verbose=False,
    )
    assert len(val_acc) == 1 and np.isfinite(val_acc[0])
    t = Trainer(lr=0.05, matmul_precision="float32", verbose=False)
    _, val_acc2, _ = t.fit(mps, train_loader, val_loader, n_epochs=1)
    # same config, same data -> identical result through either entry
    assert val_acc2 == pytest.approx(val_acc)


def test_sharded_step_matmul_precision_traces():
    from tensornetworkforml_tpu.parallel.dp import ShardedTrainer
    from tensornetworkforml_tpu.parallel.mesh import make_mesh
    from tensornetworkforml_tpu.train.sweep import SweepConfig

    mesh = make_mesh(shape=(4, 1), devices=jax.devices()[:4])
    mps = mps_init(jax.random.PRNGKey(0), N=6, M=4, L=2,
                   act_fn="softmax", loss_fn="full_cross_ent",
                   dtype=jnp.float32)
    cfg = SweepConfig(act_fn="softmax", loss_fn="full_cross_ent",
                      matmul_precision="float32")
    trainer = ShardedTrainer(mesh, mps, lr=0.01, weight_dec=1e-3, cfg=cfg)
    rng = np.random.default_rng(0)
    acc = trainer.step(rng.random((8, 6)), rng.integers(0, 2, 8))
    assert np.isfinite(acc)


def test_eager_fallback_warns():
    # odd batch count -> fused epoch unavailable -> must warn loudly
    train_loader, val_loader = _toy_loaders(n_batches=3)
    mps = mps_init(jax.random.PRNGKey(0), N=8, M=4, L=3,
                   act_fn="softmax", loss_fn="cross_entropy",
                   dtype=jnp.float32)
    with pytest.warns(UserWarning, match="fused-epoch path unavailable"):
        train_model(mps, train_loader, val_loader, lr=0.05, n_epochs=1,
                    verbose=False)


def test_onesite_checkpoint_resume(tmp_path):
    from tensornetworkforml_tpu.models.boundary import boundary_product_init
    from tensornetworkforml_tpu.train.onesite import train_boundary_model

    train_loader, val_loader = _toy_loaders(N=8, L=3, seed=3)
    x_cal, _ = next(train_loader.batches())
    model0 = boundary_product_init(
        jax.random.PRNGKey(0), N=8, M=4, L=3, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float64, calibration_x=x_cal,
    )
    ckpt = str(tmp_path / "onesite.npz")
    # straight 3-epoch run
    m_full, _ = train_boundary_model(
        model0, train_loader, val_loader, lr=0.05, n_epochs=3,
        lr_sweep_decay=0.9,
    )
    # 2 epochs, checkpoint, resume for the 3rd: must land on the SAME model
    m_part, _ = train_boundary_model(
        model0, train_loader, val_loader, lr=0.05, n_epochs=2,
        lr_sweep_decay=0.9, checkpoint_path=ckpt,
    )
    m_res, _ = train_boundary_model(
        model0, train_loader, val_loader, lr=0.05, n_epochs=3,
        lr_sweep_decay=0.9, checkpoint_path=ckpt, resume=True,
    )
    np.testing.assert_allclose(
        np.asarray(m_res.sites), np.asarray(m_full.sites), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(m_res.w), np.asarray(m_full.w), atol=1e-12
    )


def test_boundary_predictor_rejects_explicit_pallas():
    # round-2 advisor: explicit use_pallas=True for the boundary family was
    # silently ignored; it must be rejected loudly
    from tensornetworkforml_tpu.models.boundary import boundary_product_init
    from tensornetworkforml_tpu.models.serving import Predictor

    rng = np.random.default_rng(0)
    model = boundary_product_init(
        jax.random.PRNGKey(0), N=6, M=4, L=3, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float32, calibration_x=rng.random((8, 6)),
    )
    with pytest.raises(ValueError, match="boundary"):
        Predictor(model, batch_size=8, use_pallas=True)
    p = Predictor(model, batch_size=8)  # default stays fine
    assert p.use_pallas is False


def test_load_any_checkpoint_foreign_npz_message(tmp_path):
    # round-2 advisor: a foreign .npz used to die with a bare KeyError
    from tensornetworkforml_tpu.utils.checkpoint import load_any_checkpoint

    path = str(tmp_path / "foreign.npz")
    np.savez(path, weights=np.zeros((3, 3)))
    with pytest.raises(ValueError, match="meta"):
        load_any_checkpoint(path)


def test_sharded_epoch_cache_is_bounded():
    # round-2 advisor: unbounded lru_cache pinned Mesh objects forever
    from tensornetworkforml_tpu.train.brickwall import _sharded_epoch_fn

    assert _sharded_epoch_fn.cache_parameters()["maxsize"] == 8


def test_mnist_cli_dp_checkpoint_resume(tmp_path):
    from tensornetworkforml_tpu.cli.training_mnist import main

    ckpt = str(tmp_path / "dp.npz")
    out = str(tmp_path / "model.npz")
    base = [
        "--synthetic", "--dp", "--M", "4", "--batch_size", "64",
        "--out", out, "--checkpoint", ckpt,
    ]
    main(base + ["--n_epochs", "1"])
    # resume picks up at epoch 1 and runs exactly one more epoch
    val_acc, _ = main(base + ["--n_epochs", "2", "--resume"])
    assert len(val_acc) == 1


# ---------------------------------------------------------------- round 4


def test_tile_j_max_bytes_is_bytes():
    """ADVICE r4 (medium): max_bytes counts BYTES; the default 2 MB cap
    must produce blocks <= 2 MB of f32 -- and NOT the accidental 512 KB
    tiles the stale 2**19 default produced after the //4 was added."""
    from tensornetworkforml_tpu.ops.kernels.polar_split import _tile_j

    for I, J in [(384, 2048), (512, 4096), (1024, 8192), (128, 1024)]:
        nc, tj, pad = _tile_j(I, J)
        assert nc * tj == J + pad
        assert tj % 128 == 0
        assert I * tj * 4 <= 2 ** 21, (I, J, tj)  # block <= 2 MB f32
    # the hardware-bisected anchor: (384, 2048) must NOT be one 3 MB block
    nc, tj, _ = _tile_j(384, 2048)
    assert nc >= 2
    # 2 MB headroom actually used: at I=384 the cap admits >= 1024-wide
    # tiles (the 512 KB regression capped these at 256)
    assert tj >= 1024
    # gram-free callers pass 1 MB explicitly
    nc1, tj1, _ = _tile_j(1024, 4096, max_bytes=2 ** 20)
    assert 1024 * tj1 * 4 <= 2 ** 20


def test_brick_line_search_floor_only_on_stall():
    """ADVICE r4: the gamma floor applies ONLY when <dF, loss_der> <= 0
    (weight-decay stall); a legitimately small minimizer keeps its
    unfloored value instead of limit-cycling at floor*lr."""
    from tensornetworkforml_tpu.ops.contractions import boundary_vector
    from tensornetworkforml_tpu.train.brickwall import (
        BrickConfig,
        _brick_layer,
        _env_stacks,
    )

    rng = np.random.default_rng(0)
    N, M, D, L, B = 6, 4, 2, 3, 16
    sites = jnp.asarray(rng.standard_normal((N, M, D, M)) * 0.3)
    w = jnp.asarray(rng.standard_normal((M, L)) * 0.3)
    phi_t = jnp.asarray(rng.random((N, B, D)))
    lr = 0.1

    # stall regime: y == f exactly (linear + MSE -> loss_der = 0), with
    # weight decay the direction is pure decay and num = 0 <= 0
    e0 = boundary_vector(M, dtype=sites.dtype)
    _, _, l_full = _env_stacks(sites, w, phi_t, e0)
    f = (l_full @ w).T
    cfg = BrickConfig(line_search=True, line_search_floor=0.05)
    _, metrics = _brick_layer(sites, w, phi_t, f, lr, 1e-3, 0, cfg, 0.1)
    assert float(metrics["gamma"]) == pytest.approx(0.05 * lr)

    # healthy tiny-step regime: num > 0 but relax makes gamma_raw far
    # below the floor -- it must NOT be floored up
    y = jnp.asarray(rng.standard_normal((L, B)))
    cfg2 = BrickConfig(line_search=True, line_search_floor=0.05,
                       line_search_relax=1e-7)
    _, m2 = _brick_layer(sites, w, phi_t, y, lr, 0.0, 0, cfg2, 0.1)
    gamma2 = float(m2["gamma"])
    assert 0.0 < gamma2 < 0.05 * lr


def test_restart_checkpoint_saves_best_attempt(tmp_path):
    """ADVICE r4: with restarts > 0 + checkpointing, the file on disk
    after train_model returns must hold the RETURNED (best) attempt, not
    whichever attempt happened to run last."""
    from tensornetworkforml_tpu.utils.checkpoint import load_training_state

    train_loader, val_loader = _toy_loaders(N=8, L=3, seed=5)
    x_cal, _ = next(train_loader.batches())
    mps = product_init(jax.random.PRNGKey(0), N=8, M=4, L=3,
                       act_fn="linear", loss_fn="MSE",
                       dtype=jnp.float64, calibration_x=x_cal)
    reinit = lambda attempt: product_init(
        jax.random.PRNGKey(100 + attempt), N=8, M=4, L=3,
        act_fn="linear", loss_fn="MSE", dtype=jnp.float64,
        calibration_x=x_cal,
    )
    ckpt = str(tmp_path / "restart.npz")
    # threshold 1.1 is unreachable and patience 1 + min_delta 1.0 flag a
    # stall as soon as the window exists -> attempt 0 always aborts and
    # at least two attempts run
    out_mps, val_acc, _ = train_model(
        mps, train_loader, val_loader, lr=0.02, n_epochs=2,
        L2_flag=False, split_mode="canonical", verbose=False,
        restarts=1, reinit_fn=reinit, stall_patience=1,
        stall_min_delta=1.0, stall_threshold=1.1,
        checkpoint_path=ckpt,
    )
    saved, _ = load_training_state(ckpt, template=out_mps)
    np.testing.assert_array_equal(
        np.asarray(saved.sites), np.asarray(out_mps.sites)
    )
    np.testing.assert_array_equal(
        np.asarray(saved.label_site), np.asarray(out_mps.label_site)
    )


def test_sharded_trainer_rejects_l2_with_dist_split():
    """ADVICE r4: L2_flag=True + dist_split must raise, not silently
    drop the regulariser (default-cfg branch) or pass unvalidated
    (explicit-cfg branch)."""
    from tensornetworkforml_tpu.parallel.dp import ShardedTrainer
    from tensornetworkforml_tpu.parallel.mesh import make_mesh
    from tensornetworkforml_tpu.train.sweep import SweepConfig

    mesh = make_mesh(shape=(1, 8))
    mps = mps_init(jax.random.PRNGKey(0), N=6, M=8, L=2,
                   act_fn="linear", loss_fn="MSE", dtype=jnp.float32)
    with pytest.raises(ValueError, match="L2_flag"):
        ShardedTrainer(mesh, mps, lr=0.01, weight_dec=1e-3,
                       dist_split="cholqr")  # default L2_flag=True
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=True,
                      split_mode="canonical")
    with pytest.raises(ValueError, match="L2_flag"):
        ShardedTrainer(mesh, mps, lr=0.01, weight_dec=1e-3, cfg=cfg,
                       dist_split="cholqr")
