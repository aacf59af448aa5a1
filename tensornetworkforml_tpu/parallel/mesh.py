"""Device mesh construction and sharding specs.

The reference is single-process NumPy with no distributed code at all
(SURVEY.md section 2.1); the TPU-native scaling story is GSPMD over a
``jax.sharding.Mesh``:

* ``data`` axis  -- batch parallelism. The batch leg is embarrassingly
  parallel through every contraction (the reference threads it as the
  ``common='b'`` axis); sharding it makes the two-site gradient's
  batch-contraction an automatic ``psum`` over ICI, the ONLY collective a
  sweep needs.
* ``model`` axis -- bond/tensor parallelism for large bond dimension M:
  site stacks are sharded on a bond leg so environment matvecs and transfer
  products compute distributed (XLA inserts the reductions).

All sharding is declarative (``NamedSharding`` on inputs/params); the sweep
and forward kernels themselves are sharding-agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the ``data`` axis (pure DP), ``model`` axis of
    size 1. Pass ``shape=(d, m)`` for hybrid data x bond parallelism.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, batch_axis: int = 0, ndim: int = 3) -> NamedSharding:
    """Shard the batch axis of an input array over the ``data`` mesh axis."""
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def site_sharding(mesh: Mesh, bond_axis: int = 3) -> NamedSharding:
    """Shard the padded site stack ``(N, M, D, M)`` on a bond leg over the
    ``model`` axis (tensor parallelism for large M)."""
    spec = [None, None, None, None]
    spec[bond_axis] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, *arrays, batch_axes=None):
    """Device-put arrays with their batch axis sharded over ``data``.

    ``batch_axes``: per-array batch axis index (default 0 for each).
    """
    if batch_axes is None:
        batch_axes = [0] * len(arrays)
    out = []
    for arr, ax in zip(arrays, batch_axes):
        sh = batch_sharding(mesh, batch_axis=ax, ndim=arr.ndim)
        out.append(jax.device_put(arr, sh))
    return out if len(out) > 1 else out[0]


def replicate_params(mesh: Mesh, mps):
    """Replicate MPS parameters across the mesh."""
    sh = replicated(mesh)
    return mps.replace(
        sites=jax.device_put(mps.sites, sh),
        label_site=jax.device_put(mps.label_site, sh),
    )
