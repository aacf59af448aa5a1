"""Sharded training step: data-parallel (+ optional bond-parallel) sweeps.

One jitted function runs the FULL fused step -- on-device psi embedding,
batch forward, and the whole two-site sweep scan -- over a device mesh. The
batch axis is sharded on ``data``; because the gradient contraction sums
over the batch leg, GSPMD turns it into one ``psum`` of the two-site
gradient per sweep step (riding ICI), which is the entire communication
cost of data-parallel DMRG. Parameters stay replicated (or bond-sharded on
``model`` for large M; see ``parallel/mesh.py``).

The reference has no distributed machinery whatsoever to mirror
(SURVEY.md section 2.1) -- this is the TPU-native scaling design.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensornetworkforml_tpu.models.mps import MPS
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.sweep import (
    SweepConfig,
    _mirror_label,
    _mirror_sites,
    _sweep_right_arrays,
)
from tensornetworkforml_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _fused_step(sites, label_site, x_raw, y, lr, weight_dec, ranks, T, cfg,
                left_dir, n_labels):
    """Embed + one-hot + full sweep; pre-sweep accuracy included."""
    args = (sites, label_site, x_raw, y, lr, weight_dec, ranks, T, cfg,
            left_dir, n_labels)
    if cfg.matmul_precision != "default":
        with jax.default_matmul_precision(cfg.matmul_precision):
            return _fused_step_body(*args)
    return _fused_step_body(*args)


def _fused_step_body(sites, label_site, x_raw, y, lr, weight_dec, ranks, T,
                     cfg, left_dir, n_labels):
    phi = psi_embed(x_raw)
    y_onehot = jax.nn.one_hot(y, n_labels, dtype=sites.dtype).T  # (L, B)
    if left_dir:
        new_s, new_l, f0, f_fin, metrics = _sweep_right_arrays(
            _mirror_sites(sites),
            _mirror_label(label_site),
            jnp.flip(phi, axis=1),
            y_onehot,
            lr,
            weight_dec,
            ranks,
            T,
            cfg,
        )
        new_s, new_l = _mirror_sites(new_s), _mirror_label(new_l)
    else:
        new_s, new_l, f0, f_fin, metrics = _sweep_right_arrays(
            sites, label_site, phi, y_onehot, lr, weight_dec, ranks, T, cfg
        )
    batch_acc = jnp.mean((jnp.argmax(f0, axis=0) == y).astype(sites.dtype))
    return new_s, new_l, batch_acc, metrics


def make_sharded_train_step(
    mesh: Mesh,
    cfg: SweepConfig,
    T: float,
    n_labels: int,
    left_dir: bool,
    shard_bonds: bool = False,
):
    """Compile a mesh-sharded fused train step.

    Returns ``step(sites, label_site, x_raw (B,N), y (B,), lr, wd, ranks)
    -> (new_sites, new_label_site, batch_acc, metrics)``. Inputs are
    annotated: x/y batch-sharded over ``data``; parameters replicated (or
    right-bond-sharded over ``model`` when ``shard_bonds``).
    """
    repl = NamedSharding(mesh, P())
    x_sh = NamedSharding(mesh, P(DATA_AXIS, None))
    y_sh = NamedSharding(mesh, P(DATA_AXIS))
    if shard_bonds:
        sites_sh = NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        label_sh = NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
    else:
        sites_sh = label_sh = repl

    fn = partial(_fused_step, T=T, cfg=cfg, left_dir=left_dir,
                 n_labels=n_labels)
    return jax.jit(
        fn,
        in_shardings=(sites_sh, label_sh, x_sh, y_sh, repl, repl, repl),
        out_shardings=(sites_sh, label_sh, repl, repl),
    )


class ShardedTrainer:
    """Data-parallel trainer: drives the fused sharded step over a mesh.

    Per-direction steps are compiled once; batches are device_put with the
    batch axis sharded over ``data``.
    """

    def __init__(
        self,
        mesh: Mesh,
        mps: MPS,
        lr: float,
        weight_dec: float,
        L2_flag: bool = True,
        svd_method: str = "svd",
        shard_bonds: bool = False,
        cfg: SweepConfig = None,
        dist_split: str = "none",
    ):
        self.mesh = mesh
        self.mps = mps
        self.lr = lr
        self.weight_dec = weight_dec
        if dist_split != "none" and (
            L2_flag if cfg is None else cfg.L2_flag
        ):
            # The bond-distributed split path has no transfer-matrix L2
            # carry; silently dropping the regulariser would change the
            # optimisation the user asked for.
            raise ValueError(
                "L2_flag=True is not supported with dist_split != 'none' "
                "(exact transfer-matrix L2 is not implemented on the "
                "bond-distributed split path); pass L2_flag=False or a "
                "cfg with L2_flag=False, or use dist_split='none'"
            )
        if cfg is None:
            split_mode = "canonical" if dist_split != "none" else "shared"
            cfg = SweepConfig(
                act_fn=mps.act_fn,
                loss_fn=mps.loss_fn,
                L2_flag=L2_flag,
                svd_method=svd_method,
                split_mode=split_mode,
            )
        if dist_split != "none":
            # route every split of the sweep through the bond-distributed
            # path (parallel/dist_split.py) over THIS trainer's mesh
            cfg = cfg._replace(dist_split=dist_split, dist_mesh=mesh)
        self.cfg = cfg
        self._steps = {
            left: make_sharded_train_step(
                mesh, cfg, mps.T, mps.L, left, shard_bonds=shard_bonds
            )
            for left in (False, True)
        }
        self._x_sh = NamedSharding(mesh, P(DATA_AXIS, None))
        self._y_sh = NamedSharding(mesh, P(DATA_AXIS))
        self._ranks = jnp.full((mps.N - 1,), mps.M, dtype=jnp.int32)

    def step(self, x_raw: np.ndarray, y: np.ndarray) -> float:
        """One sweep on one (global) batch of raw pixels; returns accuracy."""
        mps = self.mps
        left_dir = mps.l_pos == mps.N - 1
        x_dev = jax.device_put(
            jnp.asarray(x_raw, dtype=mps.dtype), self._x_sh
        )
        y_dev = jax.device_put(jnp.asarray(y), self._y_sh)
        lr = jnp.asarray(self.lr, dtype=mps.dtype)
        wd = jnp.asarray(self.weight_dec, dtype=mps.dtype)
        new_s, new_l, acc, _ = self._steps[left_dir](
            mps.sites, mps.label_site, x_dev, y_dev, lr, wd, self._ranks
        )
        self.mps = mps.replace(
            sites=new_s,
            label_site=new_l,
            l_pos=0 if left_dir else mps.N - 1,
        )
        return float(acc)
