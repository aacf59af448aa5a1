"""Unit tests for the core contraction/embedding/SVD ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetworkforml_tpu.ops.contractions import (
    boundary_vector,
    chain_scores,
    left_env_final,
    left_env_stack,
    right_env_final,
    right_env_stack,
    site_mats,
    transfer_append,
    transfer_suffix_stack,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.ops.svd import truncated_svd_split

RNG = np.random.default_rng(0)


def _rand(*shape):
    return jnp.asarray(RNG.standard_normal(shape))


def test_psi_embed_matches_reference_formula():
    x = jnp.asarray(RNG.random((4, 7)))
    phi = psi_embed(x)
    np.testing.assert_allclose(
        np.asarray(phi[..., 0]), np.sin(np.pi * np.asarray(x) / 2), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(phi[..., 1]), np.cos(np.pi * np.asarray(x) / 2), rtol=1e-12
    )
    # psi is a normalised spin state: sin^2 + cos^2 = 1
    np.testing.assert_allclose(
        np.asarray((phi**2).sum(-1)), np.ones((4, 7)), rtol=1e-12
    )


def test_site_mats_is_per_site_contraction():
    N, B, M, D = 5, 3, 4, 2
    sites = _rand(N, M, D, M)
    phi = _rand(B, N, D)
    mats = site_mats(sites, phi)
    assert mats.shape == (N, B, M, M)
    # check one entry against an explicit loop
    n, b = 2, 1
    expected = sum(
        np.asarray(phi)[b, n, d] * np.asarray(sites)[n, :, d, :] for d in range(D)
    )
    np.testing.assert_allclose(np.asarray(mats)[n, b], expected, rtol=1e-12)


def test_env_stacks_are_prefix_and_suffix_products():
    N, B, M = 6, 2, 3
    mats = _rand(N, B, M, M)
    e0 = boundary_vector(M, dtype=mats.dtype)
    lenv = left_env_stack(mats, e0)
    renv = right_env_stack(mats, e0)
    assert lenv.shape == (N + 1, B, M)
    assert renv.shape == (N + 1, B, M)

    m = np.asarray(mats)
    for b in range(B):
        v = np.zeros(M)
        v[0] = 1.0
        np.testing.assert_allclose(np.asarray(lenv)[0, b], v, rtol=1e-12)
        for n in range(N):
            v = v @ m[n, b]
            np.testing.assert_allclose(
                np.asarray(lenv)[n + 1, b], v, rtol=1e-10, atol=1e-12
            )
        w = np.zeros(M)
        w[0] = 1.0
        np.testing.assert_allclose(np.asarray(renv)[N, b], w, rtol=1e-12)
        for n in reversed(range(N)):
            w = m[n, b] @ w
            np.testing.assert_allclose(
                np.asarray(renv)[n, b], w, rtol=1e-10, atol=1e-12
            )

    np.testing.assert_allclose(
        np.asarray(left_env_final(mats, e0)), np.asarray(lenv)[-1], rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(right_env_final(mats, e0)), np.asarray(renv)[0], rtol=1e-12
    )


def test_chain_scores_closes_the_chain():
    B, M, D, L = 3, 4, 2, 5
    left = _rand(B, M)
    label = _rand(M, D, L, M)
    x = _rand(B, D)
    right = _rand(B, M)
    out = chain_scores(left, label, x, right)
    assert out.shape == (L, B)
    b = 1
    expected = np.einsum(
        "l,ldor,d,r->o",
        np.asarray(left)[b],
        np.asarray(label),
        np.asarray(x)[b],
        np.asarray(right)[b],
    )
    np.testing.assert_allclose(np.asarray(out)[:, b], expected, rtol=1e-10)


def test_transfer_stack_matches_naive_l2_norm():
    """e0 . (suffix transfer product) . e0 == squared chain norm."""
    N, M, D = 4, 3, 2
    sites = _rand(N, M, D, M)
    e0 = boundary_vector(M, dtype=sites.dtype)
    stack = transfer_suffix_stack(sites, e0)
    assert stack.shape == (N + 1, M, M)

    # Naive: contract the chain for every basis combination of d-legs.
    s = np.asarray(sites)
    total = 0.0
    import itertools

    for ds in itertools.product(range(D), repeat=N):
        vec = np.zeros(M)
        vec[0] = 1.0
        for n in range(N):
            vec = vec @ s[n, :, ds[n], :]
        total += vec[0] ** 2
    np.testing.assert_allclose(np.asarray(stack)[0][0, 0], total, rtol=1e-10)

    # transfer_append is the adjoint-direction extension
    E = jnp.outer(e0, e0)
    for n in range(N):
        E = transfer_append(E, sites[n])
    full = jnp.einsum("lm,l,m->", E, e0, e0)  # close right boundary
    np.testing.assert_allclose(float(full), total, rtol=1e-10)


@pytest.mark.parametrize("method", ["svd", "gram"])
@pytest.mark.parametrize("shape", [(8, 20), (20, 8), (6, 6)])
def test_truncated_svd_split_reconstructs(method, shape):
    rank = min(shape)
    bmat = _rand(*shape)
    a, b = truncated_svd_split(bmat, rank, method=method)
    assert a.shape == (shape[0], rank)
    assert b.shape == (rank, shape[1])
    np.testing.assert_allclose(np.asarray(a @ b), np.asarray(bmat), atol=1e-8)


@pytest.mark.parametrize("method", ["svd", "gram"])
def test_truncated_svd_split_truncates_to_best_rank(method):
    # build a matrix with known spectrum
    U, _ = np.linalg.qr(RNG.standard_normal((12, 12)))
    V, _ = np.linalg.qr(RNG.standard_normal((10, 10)))
    S = np.array([5.0, 3.0, 1.0, 0.1] + [0.0] * 6)
    bmat = jnp.asarray(U[:, :10] @ np.diag(S) @ V.T)
    a, b = truncated_svd_split(bmat, 2, method=method)
    best = U[:, :2] @ np.diag(S[:2]) @ V[:, :2].T
    np.testing.assert_allclose(np.asarray(a @ b), best, atol=1e-8)


def test_svd_split_preserves_zero_rows_and_cols():
    """The padded-MPS invariant: zero rows/cols survive the split exactly."""
    bmat = np.zeros((8, 12))
    bmat[:5, :9] = RNG.standard_normal((5, 9))
    a, b = truncated_svd_split(jnp.asarray(bmat), 6, method="svd")
    np.testing.assert_allclose(np.asarray(a)[5:], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b)[:, 9:], 0.0, atol=1e-12)


def test_gram_canonical_split_is_isometric_f32():
    """float32 gram split must emit an isometric left factor (the Newton-
    Schulz polish compensates eigh's squared-spectrum orthogonality loss)."""
    rng = np.random.default_rng(7)
    # ill-conditioned matrix: spectrum spanning ~1e4
    U0, _ = np.linalg.qr(rng.standard_normal((64, 64)))
    V0, _ = np.linalg.qr(rng.standard_normal((640, 640)))
    S0 = np.logspace(0, -4, 64)
    bmat = jnp.asarray(
        U0 @ np.diag(S0) @ V0[:64, :], dtype=jnp.float32
    )  # (64, 640) wide
    U, SVh = truncated_svd_split(bmat, 32, method="gram",
                                 split_mode="canonical")
    gram_err = np.abs(np.asarray(U.T @ U) - np.eye(32)).max()
    assert gram_err < 1e-3, f"left factor not isometric: {gram_err}"
    # the projection reconstructs the dominant part of B
    rec = np.asarray(U @ SVh)
    top = U0[:, :32] @ np.diag(S0[:32]) @ V0[:32, :]
    assert np.abs(rec - top).max() < 1e-2


@pytest.mark.parametrize("split_mode", ["shared", "canonical"])
def test_cholsvd_split_matches_svd_f32(split_mode):
    """The Cholesky-factor SVD split (TPU fast path) must agree with the
    reference SVD split in float32, with an orthonormal-by-construction
    left factor in canonical mode."""
    rng = np.random.default_rng(9)
    U0, _ = np.linalg.qr(rng.standard_normal((64, 64)))
    V0, _ = np.linalg.qr(rng.standard_normal((640, 640)))
    S0 = np.logspace(0, -4, 64)
    bmat = jnp.asarray(U0 @ np.diag(S0) @ V0[:64, :], dtype=jnp.float32)
    a, b = truncated_svd_split(bmat, 32, method="cholsvd",
                               split_mode=split_mode)
    a2, b2 = truncated_svd_split(bmat, 32, method="svd",
                                 split_mode=split_mode)
    np.testing.assert_allclose(
        np.asarray(a @ b), np.asarray(a2 @ b2), atol=5e-6
    )
    if split_mode == "canonical":
        np.testing.assert_allclose(
            np.asarray(a.T @ a), np.eye(32), atol=5e-6
        )

    # rank-deficient padded case survives via the jitter
    z = np.zeros((8, 24), dtype=np.float32)
    z[:5, :20] = rng.standard_normal((5, 20))
    a, b = truncated_svd_split(jnp.asarray(z), 6, method="cholsvd",
                               split_mode=split_mode)
    np.testing.assert_allclose(np.asarray(a @ b), z, atol=1e-5)
