"""Checkpointing: native .npz format + importer for reference pickles.

The reference checkpoints whole ``Network`` objects with ``pickle``
(``training_diagonals.py:69-70``); its schema is the minimal state
{N, D, L, M, T, act_fn, loss_fn, l_pos, per-site arrays + axis names}
(SURVEY.md section 5). We provide:

* a native, dependency-free ``.npz`` checkpoint of the padded MPS;
* an importer that reads the reference's pickles WITHOUT importing the
  reference code (a custom Unpickler substitutes stub classes), used as the
  numerical-parity fixture gate in tests.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

import numpy as np
import jax.numpy as jnp

from tensornetworkforml_tpu.models.mps import MPS

_CKPT_VERSION = 1


def save_checkpoint(mps: MPS, path: str) -> None:
    """Save an MPS to a self-describing ``.npz`` file."""
    meta = {
        "version": _CKPT_VERSION,
        "l_pos": int(mps.l_pos),
        "act_fn": mps.act_fn,
        "loss_fn": mps.loss_fn,
        "T": float(mps.T),
    }
    np.savez(
        path,
        sites=np.asarray(mps.sites),
        label_site=np.asarray(mps.label_site),
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    )


def load_checkpoint(path: str, dtype=None) -> MPS:
    """Load an MPS from a ``.npz`` checkpoint written by ``save_checkpoint``."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode())
        sites = data["sites"]
        label_site = data["label_site"]
    if dtype is not None:
        sites = sites.astype(dtype)
        label_site = label_site.astype(dtype)
    return MPS(
        sites=jnp.asarray(sites),
        label_site=jnp.asarray(label_site),
        l_pos=meta["l_pos"],
        act_fn=meta["act_fn"],
        loss_fn=meta["loss_fn"],
        T=meta["T"],
    )


def save_training_state(path: str, mps: MPS, epoch: int) -> None:
    """Atomic mid-training checkpoint: model + epoch counter.

    Written after every epoch by ``train_model(checkpoint_path=...)``; the
    temp-file + rename makes a crash during the write recoverable (the
    previous epoch's state survives).
    """
    meta = {
        "version": _CKPT_VERSION,
        "l_pos": int(mps.l_pos),
        "act_fn": mps.act_fn,
        "loss_fn": mps.loss_fn,
        "T": float(mps.T),
        "epoch": int(epoch),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(
            fh,
            sites=np.asarray(mps.sites),
            label_site=np.asarray(mps.label_site),
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        )
    os.replace(tmp, path)


def load_training_state(path: str, template: MPS = None):
    """Load a mid-training checkpoint; returns ``(mps, next_epoch)``."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode())
        sites = data["sites"]
        label_site = data["label_site"]
    dtype = None if template is None else template.dtype
    if dtype is not None:
        sites = sites.astype(dtype)
        label_site = label_site.astype(dtype)
    mps = MPS(
        sites=jnp.asarray(sites),
        label_site=jnp.asarray(label_site),
        l_pos=meta["l_pos"],
        act_fn=meta["act_fn"],
        loss_fn=meta["loss_fn"],
        T=meta["T"],
    )
    return mps, int(meta.get("epoch", 0))


def save_boundary_checkpoint(model, path: str) -> None:
    """Save a BoundaryMPS (sites + output projection) to ``.npz``."""
    meta = {
        "version": _CKPT_VERSION,
        "kind": "boundary",
        "act_fn": model.act_fn,
        "loss_fn": model.loss_fn,
        "T": float(model.T),
    }
    np.savez(
        path,
        sites=np.asarray(model.sites),
        w=np.asarray(model.w),
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    )


def save_boundary_training_state(
    path: str, model, epoch: int, sweep_idx: int = 0, left: bool = False
) -> None:
    """Atomic mid-training checkpoint for the one-site (boundary) trainer:
    model + epoch counter + sweep-schedule state (the per-sweep lr decay and
    the alternating direction must survive a resume)."""
    meta = {
        "version": _CKPT_VERSION,
        "kind": "boundary",
        "act_fn": model.act_fn,
        "loss_fn": model.loss_fn,
        "T": float(model.T),
        "epoch": int(epoch),
        "sweep_idx": int(sweep_idx),
        "left": bool(left),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(
            fh,
            sites=np.asarray(model.sites),
            w=np.asarray(model.w),
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        )
    os.replace(tmp, path)


def load_boundary_training_state(path: str, dtype=None):
    """Load a one-site mid-training checkpoint; returns
    ``(model, next_epoch, sweep_idx, left)``."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode())
    model = load_boundary_checkpoint(path, dtype=dtype)
    return (
        model,
        int(meta.get("epoch", 0)),
        int(meta.get("sweep_idx", 0)),
        bool(meta.get("left", False)),
    )


def load_any_checkpoint(path: str, dtype=None):
    """Load either checkpoint family from one read of the archive's meta:
    returns an ``MPS`` or a ``BoundaryMPS`` according to the stored
    ``kind`` (keeps format knowledge here instead of in every caller)."""
    with np.load(path) as data:
        if "meta" not in data:
            raise ValueError(
                f"{path!r} is not a tensornetworkforml_tpu checkpoint: "
                "expected an .npz archive with a 'meta' JSON entry "
                "(entries found: " + ", ".join(sorted(data.files)) + ")"
            )
        meta = json.loads(bytes(data["meta"]).decode())
    if meta.get("kind") == "boundary":
        return load_boundary_checkpoint(path, dtype=dtype)
    return load_checkpoint(path, dtype=dtype)


def load_boundary_checkpoint(path: str, dtype=None):
    """Load a BoundaryMPS from a ``.npz`` written by
    ``save_boundary_checkpoint``."""
    from tensornetworkforml_tpu.models.boundary import BoundaryMPS

    with np.load(path) as data:
        meta = json.loads(bytes(data["meta"]).decode())
        sites = data["sites"]
        w = data["w"]
    assert meta.get("kind") == "boundary", "not a boundary-MPS checkpoint"
    if dtype is not None:
        sites = sites.astype(dtype)
        w = w.astype(dtype)
    return BoundaryMPS(
        sites=jnp.asarray(sites),
        w=jnp.asarray(w),
        act_fn=meta["act_fn"],
        loss_fn=meta["loss_fn"],
        T=meta["T"],
    )


class _RefUnpickler(pickle.Unpickler):
    """Unpickler that materialises the reference's classes as plain stubs.

    The reference pickles ``Network`` objects whose class lives in its own
    ``Network_class`` / ``Tensor_class`` modules; we substitute empty types so
    the attribute state loads without executing or importing reference code.
    """

    _SUBSTITUTE = {
        ("Network_class", "Network"),
        ("Tensor_class", "Tensor"),
        ("TensorNetwork", "Network"),
        ("TensorNetwork", "Tensor"),
        ("__main__", "Network"),
        ("__main__", "Tensor"),
    }

    def find_class(self, module: str, name: str) -> Any:
        if (module, name) in self._SUBSTITUTE:
            return type(name, (), {})
        return super().find_class(module, name)


def load_reference_pickle(path: str) -> Any:
    """Load a reference ``trained_*_model.dat`` pickle as a stub object tree."""
    with open(path, "rb") as fh:
        return _RefUnpickler(fh).load()


class _RefTensorOut:
    """Stub pickled BY REFERENCE as ``Tensor_class.Tensor``."""


class _RefNetworkOut:
    """Stub pickled BY REFERENCE as ``Network_class.Network``."""


_RefTensorOut.__module__ = "Tensor_class"
_RefTensorOut.__qualname__ = "Tensor"
_RefNetworkOut.__module__ = "Network_class"
_RefNetworkOut.__qualname__ = "Network"


def save_reference_pickle(mps: MPS, path: str) -> None:
    """Export an MPS as a pickle LOADABLE BY THE REFERENCE CODE.

    Writes a ``Network_class.Network`` object graph (class resolved by name
    at load time in an environment where the reference modules are
    importable) with the reference's attribute surface: N/D/L/M/T, act/loss
    names, ``l_pos``, and the per-site ``Tensor``s with ``elem`` arrays and
    ``axes_names``. Bonds are exported at the padded width M (the reference
    ``forward`` handles any consistent bond dims), so round-tripping through
    the reference reproduces this model's outputs exactly.
    """
    from tensornetworkforml_tpu.models.mps import ragged_site_list

    # Resolve the classes to pickle-by-name: the real reference classes when
    # its modules are importable (pickle requires identity with the module
    # attribute), otherwise inject stub modules so the names resolve.
    import sys
    import types

    try:
        import Network_class as _nc  # type: ignore
        import Tensor_class as _tc  # type: ignore

        net_cls, tensor_cls = _nc.Network, _tc.Tensor
    except ImportError:
        for mod_name, cls in (
            ("Tensor_class", _RefTensorOut),
            ("Network_class", _RefNetworkOut),
        ):
            if mod_name not in sys.modules:
                mod = types.ModuleType(mod_name)
                setattr(mod, cls.__qualname__, cls)
                sys.modules[mod_name] = mod
        net_cls, tensor_cls = _RefNetworkOut, _RefTensorOut

    elems = ragged_site_list(mps)
    As = []
    for n, elem in enumerate(elems):
        if n == mps.l_pos:
            if n == 0:
                names = ["l", "right", f"d{n}"]
            elif n == mps.N - 1:
                names = ["left", "l", f"d{n}"]
            else:
                names = ["left", "right", "l", f"d{n}"]
        else:
            if n == 0:
                names = ["right", f"d{n}"]
            elif n == mps.N - 1:
                names = ["left", f"d{n}"]
            else:
                names = ["left", "right", f"d{n}"]
        t = tensor_cls.__new__(tensor_cls)
        t.elem = np.ascontiguousarray(elem, dtype=np.float64)
        t.axes_names = np.array(names)
        t.history_axes_names = [np.array(names)]
        t.aggregations = {}
        t.shape = t.elem.shape
        t.rank = t.elem.ndim
        As.append(t)

    net = net_cls.__new__(net_cls)
    net.N, net.D, net.L, net.M = mps.N, mps.D, mps.L, mps.M
    net.T = float(mps.T)
    net.act_fn = mps.act_fn
    net.loss_fn = mps.loss_fn
    net.l_pos = int(mps.l_pos)
    net.As = As
    with open(path, "wb") as fh:
        pickle.dump(net, fh)


def mps_from_reference_pickle(path: str, dtype=jnp.float64) -> MPS:
    """Convert a reference checkpoint into the padded-uniform MPS."""
    return mps_from_reference_net(load_reference_pickle(path), dtype=dtype)


def mps_from_reference_net(net: Any, dtype=jnp.float64) -> MPS:
    """Convert a reference ``Network``-like object into the padded MPS.

    ``net`` needs the reference's attribute surface: N/M/D/L/T, l_pos,
    act_fn/loss_fn, and ``As`` -- a list of tensors with ``.elem`` arrays and
    ``.axes_names`` (axis names like ``['left','right','d5']``, the label
    site carrying an extra ``'l'`` axis; written by
    ``Network_class.py:145-148`` and mutated by training). Each ragged site
    is permuted into our ``(left, d, right)`` convention and zero-padded to
    the static bond dimension M; zero padding composed with the one-hot
    boundary contraction reproduces the ragged chain product exactly.
    """
    N, M, D, L = int(net.N), int(net.M), int(net.D), int(net.L)
    l_pos = int(net.l_pos)

    sites = np.zeros((N, M, D, M), dtype=np.float64)
    label_site = np.zeros((M, D, L, M), dtype=np.float64)

    for n, A in enumerate(net.As):
        elem = np.asarray(A.elem, dtype=np.float64)
        names = [str(s) for s in np.asarray(A.axes_names)]
        ax = {name: i for i, name in enumerate(names)}
        d_name = f"d{n}"
        has_left = "left" in ax
        has_right = "right" in ax
        has_label = "l" in ax

        # Build the permutation to (left?, d, l?, right?) then insert
        # singleton axes for missing bonds (chain edges).
        order = []
        if has_left:
            order.append(ax["left"])
        order.append(ax[d_name])
        if has_label:
            order.append(ax["l"])
        if has_right:
            order.append(ax["right"])
        elem = np.transpose(elem, order)
        if not has_left:
            elem = elem[None]
        if not has_right:
            elem = elem[..., None]
        # elem is now (ml, D, [L,] mr) with ml/mr the true (possibly
        # truncated) bond dims.
        if has_label:
            assert n == l_pos, "label axis found away from l_pos"
            ml, d_dim, l_dim, mr = elem.shape
            label_site[:ml, :, :, :mr] = elem
        else:
            ml, d_dim, mr = elem.shape
            sites[n, :ml, :, :mr] = elem

    return MPS(
        sites=jnp.asarray(sites, dtype=dtype),
        label_site=jnp.asarray(label_site, dtype=dtype),
        l_pos=l_pos,
        act_fn=str(net.act_fn),
        loss_fn=str(net.loss_fn),
        T=float(net.T),
    )
