"""Bond-distributed two-site split (explicit-collective cholqr).

Closes ROADMAP item 8 ("distributed SVD for bond-parallel M >> 1000") as
code: a column-sharded canonical cholqr split with the collectives written
out via ``jax.shard_map`` instead of left to GSPMD propagation (which, for
the small split shapes inside a sweep, chooses to replicate -- measured in
round 2; see ``tests/test_sharding.py::test_hybrid_mesh_bond_sharded_rangefinder``
for the GSPMD fallback behaviour this module supersedes at scale).

Sharding layout for ``B (I, J)`` with ``I = M*D`` rows and
``J = L*D*M`` columns, columns sharded over the mesh's ``model`` axis:

* per-device: the two J-sized matmuls (Gram ``B B^T`` and sketch
  ``B @ Omega``), each reduced with ONE ``psum`` over the model axis --
  these carry ALL the O(I*J*I) FLOPs of the split;
* replicated: the (I, q)-shaped cholqr power iterations
  (``ops.svd._cholqr_subspace`` -- the SAME code as the single-device
  ``batched_cholqr_split``, so numerics match exactly);
* output: the isometric left factor ``Q (I, rank)`` replicated, the right
  factor ``Q^T B (rank, J)`` still column-sharded (it becomes the new
  label core, whose right bond leg stays sharded).

Communication per split: 2 psums of ``I*q`` + ``I*I`` floats + 1 scalar --
independent of J, so the split scales to arbitrary bond dimension with
per-device memory O(I*J/n_dev).

The reference has no distributed code at all (SURVEY.md section 2.1); its
per-step dense SVD is ``Network_class.py:887``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensornetworkforml_tpu.ops.svd import (
    _cholqr_eps,
    _cholqr_subspace,
    _rangefinder_omega,
)
from tensornetworkforml_tpu.parallel.mesh import MODEL_AXIS


def distributed_cholqr_split(
    bmat: jnp.ndarray,
    rank: int,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    n_power: int = 3,
):
    """Canonical split of ``bmat (I, J)`` with columns sharded over
    ``mesh`` axis ``axis``: returns ``(Q (I, rank) replicated,
    R = Q^T B (rank, J) column-sharded)``.

    Numerically identical (up to psum summation order) to
    ``batched_cholqr_split(bmat[None], rank)[.][0]`` -- the subspace
    iteration core is shared code. ``J`` must be divisible by the axis
    size (always true for the two-site tensor, whose column count
    ``L*D*M`` carries the sharded bond leg ``M``).
    """
    I, J = bmat.shape
    q_cols = min(rank, I)
    n_shards = mesh.shape[axis]
    if J % n_shards:
        raise ValueError(
            f"column count {J} not divisible by mesh axis {axis!r} "
            f"size {n_shards}"
        )
    eps = _cholqr_eps(bmat.dtype, q_cols)
    om = _rangefinder_omega(J, q_cols, bmat.dtype)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=(P(), P(None, axis)),
    )
    def _split(b_loc, om_loc):
        with jax.default_matmul_precision("float32"):
            # Frobenius prescale: one scalar psum
            bn2 = jax.lax.psum(jnp.sum(b_loc * b_loc), axis)
            bn = jnp.maximum(jnp.sqrt(bn2), 1e-30)
            bs = b_loc / bn
            # the two J-carrying matmuls, each one psum
            y = jax.lax.psum(bs @ om_loc, axis)  # (I, q) sketch
            g = jax.lax.psum(bs @ bs.T, axis)  # (I, I) Gram
            q = _cholqr_subspace(g[None], y[None], eps, n_power)[0]
            r_loc = q.T @ b_loc  # stays column-sharded
            return q, r_loc

    return _split(bmat, om)


def shard_bmat_columns(
    bmat: jnp.ndarray, mesh: Mesh, axis: str = MODEL_AXIS
) -> jnp.ndarray:
    """Device-put the two-site matrix with its columns sharded over
    ``axis`` (helper for callers holding a replicated ``B``)."""
    return jax.device_put(bmat, NamedSharding(mesh, P(None, axis)))


def distributed_polar_split(
    bmat: jnp.ndarray,
    rank: int,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    interpret: bool = None,
):
    """Bond-distributed FUSED-KERNEL split: the Pallas polar-NS split
    (``ops/kernels/polar_split.py``) composed with explicit mesh
    collectives -- each shard runs the stage-1 kernel (sketch + Gram over
    its columns), ONE psum merges ``(Y, G, |B|^2)``, and the stage-2
    kernel runs the replicated subspace iteration. This is the
    Pallas-under-GSPMD path the round-2 review flagged as never exercised
    (the fused kernels were single-chip-only); column sharding follows
    ``distributed_cholqr_split`` above.

    ``interpret=None`` auto-selects interpret mode off-TPU (virtual CPU
    meshes run the same kernels through the Pallas interpreter).
    """
    from tensornetworkforml_tpu.ops.kernels.polar_split import (
        polar_iterate_pallas,
        polar_sketch_gram_pallas,
    )
    from tensornetworkforml_tpu.ops.svd import _rangefinder_omega

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    I, J = bmat.shape
    q_cols = min(rank, I)
    n_shards = mesh.shape[axis]
    if J % n_shards:
        raise ValueError(
            f"column count {J} not divisible by mesh axis {axis!r} "
            f"size {n_shards}"
        )
    out_dtype = bmat.dtype
    dead_tol = 1e-6 if bmat.dtype != jnp.float64 else 1e-12
    if bmat.dtype != jnp.float32:
        bmat = bmat.astype(jnp.float32)
    om = _rangefinder_omega(J, q_cols, bmat.dtype)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=(P(), P(None, axis)),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    def _split(b_loc, om_loc):
        y, g, n2 = polar_sketch_gram_pallas(b_loc, om_loc,
                                            interpret=interpret)
        y = jax.lax.psum(y, axis)
        g = jax.lax.psum(g, axis)
        n2 = jax.lax.psum(n2, axis)
        q = polar_iterate_pallas(y, g, n2, dead_tol=dead_tol,
                                 interpret=interpret)
        with jax.default_matmul_precision("float32"):
            r_loc = q.T @ b_loc
        return q, r_loc

    q, r = _split(bmat, om)
    return q.astype(out_dtype), r.astype(out_dtype)
