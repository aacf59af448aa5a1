"""Pallas kernel tests (interpreter mode -- runs on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetworkforml_tpu.models.mps import mps_forward, product_init
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.ops.kernels.env_scan import (
    forward_scores_pallas,
    right_env_chain_pallas,
)

RNG = np.random.default_rng(31)


@pytest.mark.parametrize("n,chunk", [(16, 16), (21, 8), (5, 16)])
def test_right_env_chain_matches_xla(n, chunk):
    """Kernel == fused XLA scan, including the identity-site padding path."""
    from tensornetworkforml_tpu.ops.contractions import (
        boundary_vector,
        right_env_final_fused,
    )

    M = 8
    sites = jnp.asarray(
        RNG.standard_normal((n, M, 2, M)) * 0.3, dtype=jnp.float32
    )
    x = jnp.asarray(RNG.random((4, n)), dtype=jnp.float32)
    e0 = boundary_vector(M, dtype=jnp.float32)
    want = right_env_final_fused(
        sites, psi_embed(x).transpose(1, 0, 2), e0
    )
    got = right_env_chain_pallas(sites, x, interpret=True, chunk=chunk)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
    )


def test_forward_scores_pallas_matches_model():
    mps = product_init(jax.random.PRNGKey(0), N=20, M=8, L=3,
                       dtype=jnp.float32)
    x = jnp.asarray(RNG.random((16, 20)), dtype=jnp.float32)
    want = np.asarray(mps_forward(mps, psi_embed(x)))
    got = np.asarray(forward_scores_pallas(mps, x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_forward_scores_pallas_requires_label_at_start():
    mps = product_init(jax.random.PRNGKey(0), N=6, M=4, L=2,
                       dtype=jnp.float32)
    mps = mps.replace(l_pos=5)
    with pytest.raises(ValueError):
        forward_scores_pallas(mps, jnp.zeros((2, 6)), interpret=True)
