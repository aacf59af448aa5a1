"""Canonical-form gauge fixing for the padded MPS.

The reference has NO gauge control; its own report (section VI) concludes
the algorithm is "very unstable" and never learns MNIST -- partial chain
products and the exact-L2 transfer products grow like lambda^N and overflow
(we reproduce exactly that in float32 at N=196 with the reference split).
Mixed-canonical form is the standard DMRG cure this framework bakes in:

* ``right_canonicalize``: with the label at site 0, make every other site a
  right-isometry (``sum_{d,r} A[l,d,r] A[l',d,r] = P_{ll'}``, a projector);
  all chain weight is absorbed into the label core.
* ``left_canonicalize``: mirror, for the label at site N-1.
* during training, ``SweepConfig(split_mode="canonical")`` keeps the gauge:
  the sweep deposits exact isometries behind the moving label core, so every
  environment has norm <= 1 and float32 training is stable at any N.

Canonicalization is a one-time O(N) pass of QR decompositions (MXU-friendly
Householder QR via ``jnp.linalg.qr``), run as a compiled ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.models.mps import MPS


def _right_canonicalize_arrays(
    sites: jnp.ndarray, label_site: jnp.ndarray, renormalize: bool = False
):
    """Label at site 0; returns (sites', label_site') with sites 1..N-1
    right-isometric. Scanned right-to-left: each site n is LQ-decomposed as
    ``A = L Q`` over the (d, r) legs and L is absorbed into site n-1.

    With ``renormalize`` the carried L is rescaled to unit Frobenius norm at
    every step; the network function then changes by an overall scalar (the
    product of site norms, which would overflow float32 over hundreds of
    un-normalised random sites) -- used by ``canonical_init`` where the
    label core is re-normalised afterwards anyway.
    """
    N, M, D, _ = sites.shape

    dtype = sites.dtype
    qr_dtype = jnp.float32 if dtype == jnp.bfloat16 else dtype

    def step(carry_L, A):
        # absorb the L factor coming from the right: A <- A . L
        A = jnp.einsum("ldr,rk->ldk", A, carry_L)
        mat = A.reshape(M, D * M).astype(qr_dtype)  # (l, d*r)
        # LQ via QR of the transpose: mat^T = Q_t R  =>  mat = R^T Q_t^T
        Qt, R = jnp.linalg.qr(mat.T)  # Qt (D*M, M), R (M, M)
        Q = Qt.T.reshape(M, D, M)  # right-isometric site
        L = R.T
        if renormalize:
            L = L / jnp.maximum(jnp.linalg.norm(L), 1e-30)
        return L.astype(dtype), Q.astype(dtype)

    # scan over sites N-1 .. 1 (reverse), starting with identity L
    L0 = jnp.eye(M, dtype=sites.dtype)
    L_final, Qs = jax.lax.scan(step, L0, sites[1:], reverse=True)
    new_sites = jnp.concatenate(
        [jnp.zeros((1, M, D, M), dtype=sites.dtype), Qs], axis=0
    )
    new_label = jnp.einsum("ldor,rk->ldok", label_site, L_final)
    return new_sites, new_label


def right_canonicalize(mps: MPS) -> MPS:
    """Gauge-fix an MPS with ``l_pos == 0`` into right-canonical form.

    The network function is EXACTLY preserved (each step replaces
    ``A_{n-1} A_n`` by ``(A_{n-1} L)(L^{-1} A_n)``); only the gauge moves.
    """
    if mps.l_pos != 0:
        raise ValueError("right_canonicalize expects the label at site 0")
    sites, label = _right_canonicalize_arrays(mps.sites, mps.label_site)
    return mps.replace(sites=sites, label_site=label)


def left_canonicalize(mps: MPS) -> MPS:
    """Gauge-fix an MPS with ``l_pos == N-1`` into left-canonical form."""
    if mps.l_pos != mps.N - 1:
        raise ValueError("left_canonicalize expects the label at site N-1")
    # mirror, right-canonicalize, mirror back
    sites_m = jnp.flip(mps.sites, axis=0).transpose(0, 3, 2, 1)
    label_m = mps.label_site.transpose(3, 1, 2, 0)
    new_sites_m, new_label_m = _right_canonicalize_arrays(sites_m, label_m)
    return mps.replace(
        sites=jnp.flip(new_sites_m, axis=0).transpose(0, 3, 2, 1),
        label_site=new_label_m.transpose(3, 1, 2, 0),
    )


def canonicalize(mps: MPS) -> MPS:
    """Gauge-fix toward the label position (must be at a chain end)."""
    if mps.l_pos == 0:
        return right_canonicalize(mps)
    if mps.l_pos == mps.N - 1:
        return left_canonicalize(mps)
    raise ValueError("canonicalize expects the label at a chain end")


def normalize_label(mps: MPS, target_norm: float = 1.0) -> MPS:
    """Rescale the label core to a target Frobenius norm.

    In canonical form the label core carries the entire chain weight, so
    this single scalar sets the output magnitude (the canonical-mode
    replacement for the reference's N-site output calibration,
    ``Network_class.py:165-182``).
    """
    norm = jnp.linalg.norm(mps.label_site)
    return mps.replace(label_site=mps.label_site * (target_norm / norm))


def canonical_init(
    key: jax.Array,
    N: int,
    M: int,
    D: int = 2,
    L: int = 10,
    T: float = 0.1,
    act_fn: str = "softmax",
    loss_fn: str = "cross_entropy",
    dtype=jnp.float32,
    target_norm: float = 1.0,
) -> MPS:
    """Random init directly in right-canonical gauge (label at site 0).

    Replaces the reference's magnitude-heuristic + two-pass calibration:
    with isometric sites the output scale is exactly the label-core norm,
    no calibration batch needed, stable at any N in float32.
    """
    from tensornetworkforml_tpu.models.mps import mps_init

    mps = mps_init(
        key,
        N=N,
        M=M,
        D=D,
        L=L,
        T=T,
        normalize=False,
        act_fn=act_fn,
        loss_fn=loss_fn,
        dtype=dtype,
    )
    sites, label = _right_canonicalize_arrays(
        mps.sites, mps.label_site, renormalize=True
    )
    mps = mps.replace(sites=sites, label_site=label)
    return normalize_label(mps, target_norm)
