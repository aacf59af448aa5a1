"""Batch-inference (serving) tests."""

import numpy as np
import pytest

from tensornetworkforml_tpu.models.serving import Predictor
from tensornetworkforml_tpu.utils.checkpoint import mps_from_reference_pickle
from tests.conftest import REFERENCE_DIR, reference_available

DIAG_CKPT = f"{REFERENCE_DIR}/trained_diag_model.dat"


@pytest.mark.skipif(not reference_available(), reason="reference absent")
def test_predictor_from_reference_checkpoint():
    from tensornetworkforml_tpu.data.diagonals import create_dataset

    pred = Predictor.from_checkpoint(DIAG_CKPT, batch_size=64)
    pred.warmup()
    data, labels = create_dataset(200, 8, sigma=0.6, seed=5)
    x = data.reshape(200, -1)
    # uneven request sizes exercise the pad/chunk path
    for n in (1, 63, 64, 65, 200):
        y_hat = pred.predict(x[:n])
        assert y_hat.shape == (n,)
        acc = (y_hat == labels[:n]).mean()
        assert acc > 0.9, f"n={n}: accuracy {acc}"
    # chunked vs single-shot consistency
    s_all = pred.scores(x)
    s_one = np.concatenate([pred.scores(x[i : i + 1]) for i in range(5)])
    np.testing.assert_allclose(s_all[:5], s_one, rtol=1e-5, atol=1e-7)


@pytest.mark.skipif(not reference_available(), reason="reference absent")
def test_predictor_sharded_over_mesh():
    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.parallel.mesh import make_mesh

    mps = mps_from_reference_pickle(DIAG_CKPT, dtype=np.float32)
    mesh = make_mesh()
    pred = Predictor(mps, batch_size=64, mesh=mesh)
    data, labels = create_dataset(128, 8, sigma=0.6, seed=6)
    y_hat = pred.predict(data.reshape(128, -1))
    assert (y_hat == labels).mean() > 0.9

    # same result as the unsharded predictor
    pred0 = Predictor(mps, batch_size=64)
    np.testing.assert_allclose(
        pred.scores(data.reshape(128, -1)),
        pred0.scores(data.reshape(128, -1)),
        rtol=1e-5,
        atol=1e-7,
    )


def test_predictor_activation_mode():
    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.models.mps import product_init

    mps = product_init(jax.random.PRNGKey(0), N=16, M=4, L=3,
                       act_fn="softmax", dtype=jnp.float32)
    pred = Predictor(mps, batch_size=8, activation=True)
    s = pred.scores(np.random.default_rng(0).random((5, 16)))
    np.testing.assert_allclose(s.sum(axis=1), 1.0, rtol=1e-5)


def test_predictor_serves_boundary_family(tmp_path):
    """The Predictor serves the boundary-label family (one-site/brick-wall
    trainers), including from its .npz checkpoint."""
    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.models.boundary import (
        boundary_forward,
        boundary_product_init,
    )
    from tensornetworkforml_tpu.models.serving import Predictor
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.utils.checkpoint import (
        save_boundary_checkpoint,
    )

    rng = np.random.default_rng(9)
    N, M, L = 12, 5, 3
    model = boundary_product_init(jax.random.PRNGKey(1), N=N, M=M, L=L,
                                  dtype=jnp.float32, noise=0.3)
    x = rng.random((23, N)).astype(np.float32)  # non-multiple of batch

    pred = Predictor(model, batch_size=8)
    got = pred.scores(x)
    want = np.asarray(
        boundary_forward(model, psi_embed(jnp.asarray(x)))
    ).T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert pred.predict(x).shape == (23,)

    path = str(tmp_path / "bmodel.npz")
    save_boundary_checkpoint(model, path)
    pred2 = Predictor.from_checkpoint(path, batch_size=8)
    np.testing.assert_allclose(pred2.scores(x), got, rtol=1e-6, atol=1e-7)
