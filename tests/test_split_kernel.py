"""Fused Pallas split kernel (ops/kernels/split_kernel.py), interpret mode.

Speed claims (TPU v5e, N=196/B=256 canonical sweeps): M=64: 134 -> 85 ms
vs the XLA rangefinder; M=128: 369 -> 307 ms (and 1038 ms for the exact
SVD). Training-quality parity gated on TPU at M=32/64 (BENCH_NOTES.md);
these CPU tests cover numerical correctness via the Pallas interpreter.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.ops.kernels.split_kernel import (
    _hqr_orth,
    rangefinder_split_pallas,
)
from tensornetworkforml_tpu.ops.svd import truncated_svd_split


def _gapped(I, J, rank, seed=0, scale=1.0, gap=0.05):
    rng = np.random.default_rng(seed)
    U = np.linalg.qr(rng.standard_normal((I, I)))[0]
    V = np.linalg.qr(rng.standard_normal((J, I)))[0]
    s = np.concatenate([
        np.geomspace(1.0, 0.1, rank),
        np.geomspace(0.1 * gap, 0.01 * gap, I - rank),
    ])
    return scale * (U * s) @ V.T


def test_hqr_orth_matches_qr():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((24, 16)), dtype=jnp.float32)
    q = np.asarray(_hqr_orth(y))
    np.testing.assert_allclose(q.T @ q, np.eye(16), atol=1e-5)
    # spans the same subspace as LAPACK QR
    q_ref = np.linalg.qr(np.asarray(y))[0]
    np.testing.assert_allclose(
        q @ (q.T @ q_ref), q_ref, atol=1e-4
    )


def test_hqr_orth_rank_deficient():
    rng = np.random.default_rng(1)
    y = np.zeros((24, 16), dtype=np.float32)
    y[:, :5] = rng.standard_normal((24, 5))
    q = np.asarray(_hqr_orth(jnp.asarray(y)))
    np.testing.assert_allclose(q.T @ q, np.eye(16), atol=1e-5)


@pytest.mark.parametrize("scale", [1.0, 1e10])
def test_split_kernel_interpret_quality(scale):
    I, J, rank = 32, 160, 16
    b = jnp.asarray(_gapped(I, J, rank, scale=scale), dtype=jnp.float32)
    q, r = rangefinder_split_pallas(b, rank, interpret=True)
    qn = np.asarray(q, dtype=np.float64)
    np.testing.assert_allclose(qn.T @ qn, np.eye(rank), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r), qn.T @ np.asarray(b), rtol=0, atol=2e-5 * scale
    )
    s = np.linalg.svd(np.asarray(b, np.float64), compute_uv=False)
    e_opt = (s[:rank] ** 2).sum()
    e_k = np.linalg.norm(qn.T @ np.asarray(b, np.float64)) ** 2
    assert e_k / e_opt > 1 - 1e-5


def test_rangefinder_pallas_method_falls_back_on_cpu():
    # on the CPU backend the method must silently use the XLA rangefinder
    b = jnp.asarray(_gapped(16, 64, 8), dtype=jnp.float64)
    q, r = truncated_svd_split(
        b, 8, "rangefinder_pallas", split_mode="canonical"
    )
    q2, r2 = truncated_svd_split(b, 8, "rangefinder", split_mode="canonical")
    np.testing.assert_allclose(np.asarray(q @ r), np.asarray(q2 @ r2),
                               atol=1e-10)


def test_rangefinder_pallas_rejects_unsupported_modes():
    b = jnp.ones((8, 16))
    with pytest.raises(ValueError, match="canonical"):
        truncated_svd_split(b, 4, "rangefinder_pallas", split_mode="shared")
    with pytest.raises(ValueError, match="reference"):
        truncated_svd_split(b, 4, "rangefinder_pallas", keep=jnp.asarray(2),
                            split_mode="canonical")
