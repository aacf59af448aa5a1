"""Boundary-label MPS: the label leg lives on a fixed output projection.

A second classifier family alongside the traveling-label MPS
(``models/mps.py``):

    f_o(x) = e0 . A_1(x_1) ... A_N(x_N) . W[:, o]

The label is a fixed ``(M, L)`` projection at the right chain end instead
of a leg that the DMRG sweep drags through the chain. The payoff is the
ONE-SITE sweep (``train/onesite.py``): site updates move the
orthogonality center with exact QR factorisations -- bond dimensions never
change, so there is NO truncated SVD anywhere in the hot path (the
measured dominant cost of two-site sweeps, BENCH_NOTES.md).

Same padded-uniform array layout as the traveling-label model; the
reference has no analogue of this family (its label leg always travels,
``Network_class.py:145-148``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from tensornetworkforml_tpu.ops.contractions import (
    boundary_vector,
    left_env_final_fused,
)


@struct.dataclass
class BoundaryMPS:
    """Sites ``(N, M, D, M)`` + output projection ``w (M, L)``."""

    sites: jnp.ndarray
    w: jnp.ndarray
    act_fn: str = struct.field(pytree_node=False, default="linear")
    loss_fn: str = struct.field(pytree_node=False, default="MSE")
    T: float = struct.field(pytree_node=False, default=0.1)

    @property
    def N(self) -> int:
        return self.sites.shape[0]

    @property
    def M(self) -> int:
        return self.sites.shape[1]

    @property
    def D(self) -> int:
        return self.sites.shape[2]

    @property
    def L(self) -> int:
        return self.w.shape[1]

    @property
    def dtype(self):
        return self.sites.dtype


@partial(jax.jit, static_argnames=())
def boundary_forward_arrays(sites, w, phi):
    """Scores ``(L, B)``: left-to-right chain scan closed by ``w``."""
    e0 = boundary_vector(sites.shape[1], dtype=sites.dtype)
    left = left_env_final_fused(sites, phi.transpose(1, 0, 2), e0)  # (B, M)
    return (left @ w).T


def boundary_forward(model: BoundaryMPS, phi: jnp.ndarray) -> jnp.ndarray:
    return boundary_forward_arrays(
        model.sites, model.w, phi.astype(model.dtype)
    )


def grow_boundary_bond(model: BoundaryMPS, new_M: int) -> BoundaryMPS:
    """Embed a boundary-label MPS into a larger bond dimension (zero
    padding; exactly function-preserving -- see ``mps.grow_bond``).

    New bond slots (and the new rows of the output projection ``w``) start
    at zero; two-site pair splits rotate weight into them on the next
    layer (the merged pair's row space spans ``old_M * D`` directions, so
    each growth step can double M at D=2)."""
    M = model.M
    if new_M < M:
        raise ValueError(f"cannot shrink bonds: {M} -> {new_M}")
    if new_M == M:
        return model
    N, _, D, _ = model.sites.shape
    sites = jnp.zeros((N, new_M, D, new_M), dtype=model.dtype)
    sites = sites.at[:, :M, :, :M].set(model.sites)
    w = jnp.zeros((new_M, model.L), dtype=model.dtype)
    w = w.at[:M, :].set(model.w)
    return model.replace(sites=sites, w=w)


def boundary_product_init(
    key: jax.Array,
    N: int,
    M: int,
    D: int = 2,
    L: int = 10,
    T: float = 0.1,
    noise: float = 1e-2,
    act_fn: str = "linear",
    loss_fn: str = "MSE",
    dtype=jnp.float32,
    calibration_x=None,
) -> BoundaryMPS:
    """Per-site-calibrated near-identity init (see ``mps.product_init``)
    with a small random output projection."""
    if calibration_x is not None:
        x = jnp.asarray(calibration_x, dtype=dtype)
        psi_sum = jnp.sin(jnp.pi * x / 2) + jnp.cos(jnp.pi * x / 2)
        c = jnp.maximum(jnp.mean(psi_sum, axis=0), 1e-3)
    else:
        c = jnp.full((N,), 4.0 / jnp.pi, dtype=dtype)
    base = (1.0 / c).astype(dtype)

    k_sites, k_w = jax.random.split(key)
    eye = jnp.eye(M, dtype=dtype)
    core = jnp.broadcast_to(eye[:, None, :], (M, D, M))
    sites = base[:, None, None, None] * core[None]
    sites = sites + noise * jax.random.normal(k_sites, (N, M, D, M), dtype=dtype)
    # no right-edge masking: ALL M components of the final bond feed the
    # output projection (unlike the traveling-label chain, which closes on
    # a boundary vector)
    w = (noise + 1.0 / M) * jax.random.normal(k_w, (M, L), dtype=dtype)
    return BoundaryMPS(sites=sites, w=w, act_fn=act_fn, loss_fn=loss_fn, T=T)
