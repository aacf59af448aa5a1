"""Truncated SVD split of the two-site tensor.

The reference splits the merged two-site tensor B back into two site tensors
with ``np.linalg.svd``, multiplying sqrt(S) into BOTH factors for stability
and truncating middle bonds to the pre-merge bond dimension
(``Network_class.py:839-962``; the adaptive variance threshold there is dead
code, see its docstring at :870). With the padded uniform representation the
truncation rank is always the static bond dimension M, which keeps shapes
static under ``jit``/``scan``.

Backends:
  * ``"svd"``  -- ``jnp.linalg.svd`` (CPU-accurate; what tests use in x64).
  * ``"gram"`` -- eigendecomposition of the smaller Gram matrix ``B B^T``.
    On TPU ``eigh`` of the (M*D x M*D) symmetric matrix is much faster than
    the general SVD lowering and the MXU does the two projections
    (``U^T B``); it squares the condition number, which is acceptable here
    because sqrt(S) is split onto both factors and the spectrum is truncated
    to the leading M values anyway.
"""

from __future__ import annotations

import jax.numpy as jnp


def truncated_svd_split(
    bmat: jnp.ndarray, rank: int, method: str = "svd", keep=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split ``bmat (I, J)`` into ``(I, rank) @ (rank, J)``.

    Returns ``(U sqrt(S), sqrt(S) V^h)`` truncated to ``rank`` singular
    values, with sqrt(S) shared between the factors as in the reference
    (``Network_class.py:871, 912-915``). ``rank`` must be <= min(I, J).

    ``keep`` (optional, traced int) additionally zeroes singular values
    beyond the first ``keep`` -- equivalent to a harder truncation but with
    static output shapes, used to reproduce the reference's evolving
    bond-rank rule (``Network_class.py:894-910``) inside a compiled scan.
    """
    if method == "svd":
        U, S, Vh = jnp.linalg.svd(bmat, full_matrices=False)
        U = U[:, :rank]
        S = S[:rank]
        Vh = Vh[:rank, :]
        if keep is not None:
            S = jnp.where(jnp.arange(rank) < keep, S, 0.0)
        sqrt_s = jnp.sqrt(jnp.maximum(S, 0.0))
        return U * sqrt_s[None, :], sqrt_s[:, None] * Vh
    elif method == "gram":
        return _gram_split(bmat, rank, keep)
    else:
        raise ValueError(f"unknown SVD method {method!r}")


def _gram_split(
    bmat: jnp.ndarray, rank: int, keep=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Truncated split via eigh of the smaller Gram matrix."""
    I, J = bmat.shape
    if I <= J:
        gram = bmat @ bmat.T  # (I, I), symmetric PSD
        evals, evecs = jnp.linalg.eigh(gram)  # ascending
        # top-`rank` eigenpairs
        evals = evals[::-1][:rank]
        U = evecs[:, ::-1][:, :rank]  # (I, rank)
        if keep is not None:
            evals = jnp.where(jnp.arange(rank) < keep, evals, 0.0)
        S = jnp.sqrt(jnp.maximum(evals, 0.0))
        sqrt_s = jnp.sqrt(S)
        # sqrt(S) V^h = sqrt(S) S^{-1} U^T B ; guard zero singular values
        inv = jnp.where(S > 0, 1.0 / jnp.maximum(S, 1e-30), 0.0)
        svh = (sqrt_s * inv)[:, None] * (U.T @ bmat)
        return U * sqrt_s[None, :], svh
    else:
        right, left_t = _gram_split(bmat.T, rank, keep)
        return left_t.T, right.T
