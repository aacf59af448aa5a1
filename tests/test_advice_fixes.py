"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. matmul_precision is honored on the fused-epoch and sharded-step paths.
2. train_model/Trainer expose the matmul_precision knob.
3. canonical split with a traced `keep` must not leak weight into bond
   slots beyond the kept rank (U's columns are zeroed too).
4. --checkpoint/--resume work on the CLI's --dp and onesite paths.
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
