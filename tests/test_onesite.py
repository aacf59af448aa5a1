"""One-site (boundary-label) trainer tests: isometry maintenance, exactness
of QR center moves, learning, and forward correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.data.loader import prepare_dataset
from tensornetworkforml_tpu.models.boundary import (
    BoundaryMPS,
    boundary_forward,
    boundary_product_init,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.onesite import (
    OneSiteConfig,
    onesite_sweep,
    train_boundary_model,
)

RNG = np.random.default_rng(71)


def test_boundary_forward_matches_naive():
    N, M, D, L, B = 7, 4, 2, 3, 5
    model = boundary_product_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                                  dtype=jnp.float64, noise=0.1)
    x = RNG.random((B, N))
    phi = np.asarray(psi_embed(jnp.asarray(x)))
    got = np.asarray(boundary_forward(model, jnp.asarray(phi)))

    sites = np.asarray(model.sites)
    w = np.asarray(model.w)
    for b in range(B):
        v = np.zeros(M)
        v[0] = 1.0
        for n in range(N):
            v = np.einsum("l,d,ldr->r", v, phi[b, n], sites[n])
        np.testing.assert_allclose(got[:, b], v @ w, rtol=1e-9, atol=1e-11)


def test_onesite_sweep_isometries_and_learning():
    N, M, L, B = 12, 5, 2, 64
    data, labels = create_dataset(512, 4, 0.5, seed=3)
    x = data.reshape(512, -1)[:B]
    y = labels[:B]
    model = boundary_product_init(jax.random.PRNGKey(1), N=16, M=M, L=L,
                                  act_fn="linear", loss_fn="MSE",
                                  dtype=jnp.float64, calibration_x=x)
    phi = psi_embed(jnp.asarray(x))
    y1h = jnp.zeros((L, B), dtype=jnp.float64).at[jnp.asarray(y),
                                                  jnp.arange(B)].set(1.0)
    cfg = OneSiteConfig(act_fn="linear", loss_fn="MSE")

    m, metrics = onesite_sweep(model, phi, y1h, 0.1, 1e-5, False, cfg)
    assert metrics["accuracy"].shape == (16,)
    # after a right sweep, sites 0..N-2 are SCALED left-isometries
    # (A = g Q, so A^T A = g^2 I -- the scaled-isometry gauge)
    s = np.asarray(m.sites)
    for n in range(15):
        A = s[n].reshape(-1, M)
        P = A.T @ A
        g2 = np.trace(P) / M
        np.testing.assert_allclose(P, g2 * np.eye(M), atol=1e-8 * g2,
                                   err_msg=f"site {n}")

    m2, _ = onesite_sweep(m, phi, y1h, 0.1, 1e-5, True, cfg)
    s2 = np.asarray(m2.sites)
    for n in range(1, 16):
        A = s2[n].reshape(M, -1)
        P = A @ A.T
        g2 = np.trace(P) / M
        np.testing.assert_allclose(P, g2 * np.eye(M), atol=1e-8 * g2,
                                   err_msg=f"site {n}")

    # several alternating sweeps reduce the batch MSE
    f0 = np.asarray(boundary_forward(model, phi))
    mm = model
    for i in range(6):
        mm, _ = onesite_sweep(mm, phi, y1h, 0.1, 1e-5, i % 2 == 1, cfg)
    f1 = np.asarray(boundary_forward(mm, phi))
    mse0 = np.mean((np.asarray(y1h) - f0) ** 2)
    mse1 = np.mean((np.asarray(y1h) - f1) ** 2)
    assert mse1 < 0.5 * mse0, (mse0, mse1)


def test_onesite_center_move_preserves_function():
    """With lr=0 the sweep is pure re-gauging: the function is unchanged."""
    model = boundary_product_init(jax.random.PRNGKey(2), N=10, M=4, L=3,
                                  dtype=jnp.float64, noise=0.1)
    B = 6
    phi = psi_embed(jnp.asarray(RNG.random((B, 10))))
    y1h = jnp.zeros((3, B), dtype=jnp.float64).at[0].set(1.0)
    cfg = OneSiteConfig(act_fn="linear", loss_fn="MSE", update_w=False)
    want = np.asarray(boundary_forward(model, phi))
    m, _ = onesite_sweep(model, phi, y1h, 0.0, 0.0, False, cfg)
    got = np.asarray(boundary_forward(m, phi))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)
    m2, _ = onesite_sweep(m, phi, y1h, 0.0, 0.0, True, cfg)
    got2 = np.asarray(boundary_forward(m2, phi))
    np.testing.assert_allclose(got2, want, rtol=1e-9, atol=1e-11)


def test_onesite_trains_diagonals():
    data, labels = create_dataset(1600, 6, 0.6, seed=5)
    tr, va, _ = prepare_dataset(data, labels, 1.0, 0.2, 128, 64, 64,
                                embed=False, seed=6)
    x_cal, _ = next(tr.batches())
    model = boundary_product_init(jax.random.PRNGKey(3), N=36, M=8, L=2,
                                  act_fn="linear", loss_fn="MSE",
                                  dtype=jnp.float32, calibration_x=x_cal)
    model, val_acc = train_boundary_model(model, tr, va, lr=0.2, n_epochs=3)
    assert max(val_acc) >= 0.97, val_acc


def test_onesite_renorm_long_chain_learns():
    """Full-resolution N=784 chain: the scaled-isometry gauge keeps one-site
    sweeps finite AND learning (two-site peaks ~0.74 here; the reference
    never learned any MNIST variant)."""
    from tensornetworkforml_tpu.data.mnist import synthetic_mnist

    tr_x, tr_y, te_x, te_y = synthetic_mnist(1024, 128)
    data = np.concatenate([tr_x, te_x]) / 255.0
    labels = np.concatenate([tr_y, te_y])
    tr, va, _ = prepare_dataset(data, labels, 1.0, 0.15, 128, 128, 128,
                                embed=False, seed=0)
    x_cal, _ = next(tr.batches())
    model = boundary_product_init(jax.random.PRNGKey(0), N=784, M=12, L=10,
                                  act_fn="linear", loss_fn="MSE",
                                  dtype=jnp.float32, calibration_x=x_cal)
    model, val_acc = train_boundary_model(model, tr, va, lr=0.05, n_epochs=1)
    assert bool(jnp.isfinite(model.sites).all())
    assert max(val_acc) >= 0.85, val_acc


def test_boundary_checkpoint_roundtrip(tmp_path):
    import os

    from tensornetworkforml_tpu.utils.checkpoint import (
        load_boundary_checkpoint,
        save_boundary_checkpoint,
    )

    model = boundary_product_init(jax.random.PRNGKey(4), N=12, M=4, L=3,
                                  dtype=jnp.float32)
    path = os.path.join(tmp_path, "b.npz")
    save_boundary_checkpoint(model, path)
    loaded = load_boundary_checkpoint(path)
    phi = psi_embed(jnp.asarray(RNG.random((5, 12)), dtype=jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(boundary_forward(model, phi)),
        np.asarray(boundary_forward(loaded, phi)),
    )
    assert loaded.act_fn == model.act_fn
