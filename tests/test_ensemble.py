"""Ensemble-of-chains model family (models/ensemble.py).

The load-bearing claim is that the ensemble IS a monolithic label-leg
MPS (direct sum, bond L*m): ``to_direct_sum`` must reproduce
``ensemble_forward`` exactly, which also exercises the padded-edge-block
boundary bookkeeping of the export. Learning quality on the pm0 teacher
gate is measured separately (scripts/teacher_ensemble.py,
results/teacher_pm0.json)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetworkforml_tpu.models.ensemble import (
    EnsembleMPS,
    ensemble_accuracy,
    ensemble_forward,
    ensemble_init,
    to_direct_sum,
)
from tensornetworkforml_tpu.models.mps import mps_forward
from tensornetworkforml_tpu.ops.embedding import psi_embed


@pytest.fixture(scope="module")
def ens_and_phi():
    N, m, L, B = 9, 3, 4, 7
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, N),
                           dtype=jnp.float64)
    ens = ensemble_init(key, N=N, m=m, L=L, calibration_x=x,
                        dtype=jnp.float64)
    # non-trivial head scales; bias stays 0 for the direct-sum export
    ens = ens.replace(
        head_a=jnp.asarray([1.0, -0.5, 2.0, 0.25], jnp.float64)
    )
    return ens, psi_embed(x)


def test_forward_shape_and_finite(ens_and_phi):
    ens, phi = ens_and_phi
    f = ensemble_forward(ens, phi)
    assert f.shape == (ens.L, phi.shape[0])
    assert bool(jnp.isfinite(f).all())


def test_direct_sum_equivalence(ens_and_phi):
    """The exported bond-L*m monolithic MPS computes the same logits."""
    ens, phi = ens_and_phi
    f_ens = np.asarray(ensemble_forward(ens, phi))
    mono = to_direct_sum(ens)
    assert mono.M == ens.L * ens.m
    f_mono = np.asarray(mps_forward(mono, phi))
    np.testing.assert_allclose(f_mono, f_ens, rtol=1e-10, atol=1e-12)


def test_direct_sum_rejects_bias(ens_and_phi):
    ens, _ = ens_and_phi
    biased = ens.replace(head_b=ens.head_b.at[1].set(0.5))
    with pytest.raises(ValueError, match="head_b"):
        to_direct_sum(biased)


def test_head_affine_applied(ens_and_phi):
    ens, phi = ens_and_phi
    f0 = ensemble_forward(ens, phi)
    shifted = ens.replace(head_b=ens.head_b + 1.5,
                          head_a=ens.head_a * 2.0)
    f1 = ensemble_forward(shifted, phi)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(2.0 * f0 + 1.5),
                               rtol=1e-12)


def test_accuracy_helper(ens_and_phi):
    ens, phi = ens_and_phi
    y = jnp.argmax(ensemble_forward(ens, phi), 0)
    assert float(ensemble_accuracy(ens, phi, y)) == 1.0


def test_ensemble_is_trainable_pytree(ens_and_phi):
    """grad flows to every leaf (the Adam path in the gate script)."""
    ens, phi = ens_and_phi
    y = jnp.zeros((phi.shape[0],), jnp.int32)

    def loss(e):
        f = ensemble_forward(e, phi)
        return jnp.mean(jax.nn.logsumexp(f, 0)
                        - f[y, jnp.arange(phi.shape[0])])

    g = jax.grad(loss)(ens)
    for leaf in (g.sites, g.label_site, g.head_a, g.head_b):
        assert bool(jnp.isfinite(leaf).all())
        assert float(jnp.abs(leaf).max()) > 0.0
