"""Autodiff training: optimise ALL site tensors simultaneously with optax.

An alternative to the DMRG two-site sweep that the reference could never
offer (its gradients are hand-derived for one merged pair at a time,
``Network_class.py:577-763``): differentiate the full chain contraction
with ``jax.grad`` and run a first-order optimiser over every site at once.
Useful as a finetuning stage after DMRG sweeps (bond structure fixed) and
as the only trainer that supports the ring topology (``models/ring.py``).

The whole update step -- embedding, forward, loss, backward, optimiser --
is one jitted function; bond dimensions stay fixed (no SVD truncation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tensornetworkforml_tpu.models.mps import (
    MPS,
    apply_act_fn,
    _forward_arrays,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed


class AutodiffConfig(NamedTuple):
    loss: str = "softmax_xent"  # "softmax_xent" | "mse"
    optimizer: str = "adam"  # "adam" | "sgd"
    learning_rate: float = 1e-3
    weight_decay: float = 0.0


def _loss_fn(params, x_raw, y, l_pos, T, cfg, forward_arrays):
    sites, label_site = params
    phi = psi_embed(x_raw)
    scores = forward_arrays(sites, label_site, phi, l_pos)  # (L, B)
    if cfg.loss == "softmax_xent":
        logits = (scores / T).T  # (B, L)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y
        ).mean()
    elif cfg.loss == "mse":
        y_onehot = jax.nn.one_hot(y, scores.shape[0], dtype=scores.dtype).T
        loss = jnp.mean((scores - y_onehot) ** 2)
    else:
        raise ValueError(f"unknown loss {cfg.loss!r}")
    if cfg.weight_decay:
        loss = loss + cfg.weight_decay * (
            jnp.sum(sites**2) + jnp.sum(label_site**2)
        )
    acc = jnp.mean((jnp.argmax(scores, axis=0) == y).astype(scores.dtype))
    return loss, acc


def make_optimizer(cfg: AutodiffConfig):
    if cfg.optimizer == "adam":
        return optax.adam(cfg.learning_rate)
    elif cfg.optimizer == "sgd":
        return optax.sgd(cfg.learning_rate)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


class AutodiffTrainer:
    """Optax-based full-gradient trainer over a fixed bond structure."""

    def __init__(self, mps: MPS, cfg: AutodiffConfig = AutodiffConfig(),
                 forward_arrays=None):
        self.mps = mps
        self.cfg = cfg
        self.opt = make_optimizer(cfg)
        self.opt_state = self.opt.init((mps.sites, mps.label_site))
        fwd = forward_arrays or _forward_arrays
        l_pos, T = mps.l_pos, mps.T

        @jax.jit
        def train_step(params, opt_state, x_raw, y):
            (loss, acc), grads = jax.value_and_grad(
                lambda p: _loss_fn(p, x_raw, y, l_pos, T, cfg, fwd),
                has_aux=True,
            )(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, acc

        self._step = train_step

    def _params(self):
        return (self.mps.sites, self.mps.label_site)

    def _set_params(self, params):
        self.mps = self.mps.replace(sites=params[0], label_site=params[1])

    def step(self, x_raw, y) -> tuple[float, float]:
        """One optimiser step on a batch; returns ``(loss, accuracy)``."""
        params = self._params()
        x_raw = jnp.asarray(x_raw, dtype=self.mps.dtype)
        y = jnp.asarray(np.asarray(y))
        params, self.opt_state, loss, acc = self._step(
            params, self.opt_state, x_raw, y
        )
        self._set_params(params)
        return float(loss), float(acc)

    def fit(self, loader, n_epochs: int, verbose: bool = False):
        """Epoch loop over a loader of raw-pixel batches."""
        from tensornetworkforml_tpu.train.trainer import _loader_batches

        history = []
        for epoch in range(n_epochs):
            losses, accs = [], []
            for x, y in _loader_batches(loader):
                loss, acc = self.step(np.asarray(x).reshape(len(x), -1), y)
                losses.append(loss)
                accs.append(acc)
            history.append(
                {"loss": float(np.mean(losses)), "accuracy": float(np.mean(accs))}
            )
            if verbose:
                print(f"epoch {epoch}: {history[-1]}")
        return history


class BoundaryAutodiffTrainer(AutodiffTrainer):
    """Autodiff trainer for the boundary-label family: optimises
    ``(sites, w)`` jointly with optax (finetuning stage after one-site or
    brick-wall training; bond structure fixed)."""

    def __init__(self, model, cfg: AutodiffConfig = AutodiffConfig()):
        from tensornetworkforml_tpu.models.boundary import (
            boundary_forward_arrays,
        )

        self.mps = model  # BoundaryMPS: same .dtype/.T surface
        self.cfg = cfg
        self.opt = make_optimizer(cfg)
        self.opt_state = self.opt.init((model.sites, model.w))
        T = model.T

        def fwd(sites, w, phi, _l_pos):
            return boundary_forward_arrays(sites, w, phi)

        @jax.jit
        def train_step(params, opt_state, x_raw, y):
            (loss, acc), grads = jax.value_and_grad(
                lambda p: _loss_fn(p, x_raw, y, 0, T, cfg, fwd),
                has_aux=True,
            )(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, acc

        self._step = train_step

    def _params(self):
        return (self.mps.sites, self.mps.w)

    def _set_params(self, params):
        self.mps = self.mps.replace(sites=params[0], w=params[1])

    @property
    def model(self):
        return self.mps
