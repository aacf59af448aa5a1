"""Whole-epoch fused training: one XLA program per epoch.

The reference's training loop is a Python loop of ~10-20 array ops per
batch; on an accelerator behind a dispatch boundary every eager op is a
round trip. Here an ENTIRE epoch -- embedding, forward, and one full
two-site sweep per batch, directions alternating per batch exactly like the
reference (``Network_class.py:323-333``) -- is a single ``jit`` containing a
``lax.scan`` over batch PAIRS (right sweep + mirrored left sweep), so an
epoch is ONE device dispatch regardless of batch count.

Requires uniform batch shapes (drop-last loaders); odd batch counts process
the final batch in the next epoch's leading position -- callers pass an even
number of batches (the canonical loaders use drop_last anyway).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.models.mps import MPS
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.sweep import (
    SweepConfig,
    _mirror_label,
    _mirror_sites,
    _sweep_right_arrays,
)


@partial(jax.jit, static_argnames=("T", "cfg", "n_labels"))
def _epoch_scan(
    sites, label_site, x_epoch, y_epoch, lr, weight_dec, ranks, T, cfg,
    n_labels,
):
    """x_epoch (2*pairs, B, N) raw pixels; y_epoch (2*pairs, B) int labels.

    The label leg must start at site 0. Returns
    ``(sites, label_site, accs (2*pairs,), maes (2*pairs, N-1))``.
    """
    args = (
        sites, label_site, x_epoch, y_epoch, lr, weight_dec, ranks, T, cfg,
        n_labels,
    )
    if cfg.matmul_precision != "default":
        with jax.default_matmul_precision(cfg.matmul_precision):
            return _epoch_scan_body(*args)
    return _epoch_scan_body(*args)


def _epoch_scan_body(
    sites, label_site, x_epoch, y_epoch, lr, weight_dec, ranks, T, cfg,
    n_labels,
):
    dtype = sites.dtype

    def one_sweep(sites, label_site, x, y, left_dir):
        phi = psi_embed(x.astype(dtype))
        y_onehot = jax.nn.one_hot(y, n_labels, dtype=dtype).T
        if left_dir:
            new_s, new_l, f0, _, metrics = _sweep_right_arrays(
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
            new_s, new_l, f0, _, metrics = _sweep_right_arrays(
                sites, label_site, phi, y_onehot, lr, weight_dec, ranks, T,
                cfg,
            )
        acc = jnp.mean((jnp.argmax(f0, axis=0) == y).astype(dtype))
        return new_s, new_l, acc, metrics

    pairs = x_epoch.shape[0] // 2
    xs = (
        x_epoch.reshape(pairs, 2, *x_epoch.shape[1:]),
        y_epoch.reshape(pairs, 2, *y_epoch.shape[1:]),
    )

    def pair_step(carry, x):
        sites, label_site = carry
        xp, yp = x
        sites, label_site, acc_r, met_r = one_sweep(
            sites, label_site, xp[0], yp[0], False
        )
        sites, label_site, acc_l, met_l = one_sweep(
            sites, label_site, xp[1], yp[1], True
        )
        out = {
            "batch_accuracy": jnp.stack([acc_r, acc_l]),
            "accuracy": jnp.stack([met_r["accuracy"], met_l["accuracy"]]),
            "MAE": jnp.stack([met_r["MAE"], met_l["MAE"]]),
        }
        return (sites, label_site), out

    (sites, label_site), out = jax.lax.scan(
        pair_step, (sites, label_site), xs
    )
    nb = 2 * pairs
    return (
        sites,
        label_site,
        out["batch_accuracy"].reshape(nb),
        {
            "accuracy": out["accuracy"].reshape(nb, -1),
            "MAE": out["MAE"].reshape(nb, -1),
        },
    )


def fused_epoch(
    mps: MPS,
    x_epoch,
    y_epoch,
    lr: float,
    weight_dec: float,
    cfg: SweepConfig = None,
    mesh=None,
):
    """Run one fused epoch; the label leg must start at site 0 and the
    number of batches must be even (direction alternates per batch, so the
    label returns to site 0 at the end).

    With a ``mesh``, each batch's sample axis is sharded over the mesh's
    ``data`` axis (parameters replicated): the whole DATA-PARALLEL epoch is
    still ONE device program, with one gradient psum per sweep step riding
    the interconnect.

    Returns ``(new_mps, batch_accs (n_batches,), step_metrics)`` where
    ``step_metrics`` holds the per-step series ``accuracy`` and ``MAE``
    with shape ``(n_batches, N-1)`` (the reference's ``var_hist`` content).
    """
    if cfg is None:
        cfg = SweepConfig(act_fn=mps.act_fn, loss_fn=mps.loss_fn)
    if mps.l_pos != 0:
        raise ValueError("fused_epoch expects the label leg at site 0")
    if x_epoch.shape[0] % 2 != 0:
        raise ValueError("fused_epoch needs an even number of batches")
    ranks = jnp.full((mps.N - 1,), mps.M, dtype=jnp.int32)
    lr = jnp.asarray(lr, dtype=mps.dtype)
    weight_dec = jnp.asarray(weight_dec, dtype=mps.dtype)
    x_dev = jnp.asarray(x_epoch, dtype=mps.dtype)
    y_dev = jnp.asarray(y_epoch)
    sites, label_site = mps.sites, mps.label_site

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tensornetworkforml_tpu.parallel.mesh import DATA_AXIS

        x_dev = jax.device_put(
            x_dev, NamedSharding(mesh, P(None, DATA_AXIS, None))
        )
        y_dev = jax.device_put(y_dev, NamedSharding(mesh, P(None, DATA_AXIS)))
        repl = NamedSharding(mesh, P())
        sites = jax.device_put(sites, repl)
        label_site = jax.device_put(label_site, repl)

    sites, label_site, accs, step_metrics = _epoch_scan(
        sites,
        label_site,
        x_dev,
        y_dev,
        lr,
        weight_dec,
        ranks,
        mps.T,
        cfg,
        mps.L,
    )
    return mps.replace(sites=sites, label_site=label_site), accs, step_metrics
