"""One-site DMRG sweeps for the boundary-label MPS: NO SVD anywhere.

The two-site sweep's dominant cost is the truncated SVD split (~83% of
step time, BENCH_NOTES.md). The boundary-label family
(``models/boundary.py``) removes it: each site is updated in place and the
orthogonality center moves by an EXACT reduced QR (rank never exceeds M,
so nothing is truncated). QR on TPU is a non-iterative Householder
factorisation -- substantially cheaper than the SVD's iteration loop.

Cache discipline mirrors the two-site engine: the environments AHEAD of
the moving center are stale (precomputed per batch; those sites are
untouched during the sweep), the environment BEHIND is carried and
extended with each just-updated, freshly-isometric site. The output
projection ``w`` is updated once per sweep from the full-chain
environment.

Environments ahead of the center carry the label leg (they close on
``w``): shape (B, M, L).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.models.boundary import BoundaryMPS
from tensornetworkforml_tpu.models.mps import apply_act_fn, loss_derivative
from tensornetworkforml_tpu.ops.contractions import boundary_vector


class OneSiteConfig(NamedTuple):
    act_fn: str = "linear"
    loss_fn: str = "MSE"
    update_w: bool = True
    # scaled-isometry gauge: fold a per-step scale into each site so the
    # carried environment keeps unit mean norm and the QR factor stays
    # O(1). Required for chains past N ~ 500 in float32 (pure QR moves
    # concentrate exp(N) scale in the carried factor); changes the
    # effective step size, so keep False for short chains.
    renorm: bool = False
    # MXU precision for the sweep's contractions ("default" = bf16 passes)
    matmul_precision: str = "default"


def _site_update(A, x, l_env, r_envL, y_onehot, f, lr, weight_dec, T, cfg):
    """Gradient-update one site given its environments.

    A (M,D,M), x (B,D), l_env (B,M), r_envL (B,M,L); f (L,B) is the
    current network output (recomputed by the caller). Returns
    ``(A_new, metrics)``.
    """
    dtype = A.dtype
    f_act = apply_act_fn(f, cfg.act_fn, T)
    y_true = jnp.argmax(y_onehot, axis=0)
    acc = jnp.mean((jnp.argmax(f_act, axis=0) == y_true).astype(dtype))
    mae = jnp.mean(jnp.abs(y_onehot - f_act))

    loss_der = loss_derivative(f_act, y_onehot, cfg.loss_fn, cfg.act_fn, T)
    # dA[le,d,ri] = sum_{b,o} loss_der[o,b] l_env[b,le] x[b,d] r_envL[b,ri,o]
    u = jnp.einsum("ob,bro->br", loss_der, r_envL)  # (B, M)
    dA = jnp.einsum("bl,bd,br->ldr", l_env, x, u)
    dA = dA - weight_dec * A

    s_A = jnp.sum(jnp.abs(A))
    s_dA = jnp.sum(jnp.abs(dA))
    dA = dA * jnp.where(s_dA > s_A, s_A / jnp.maximum(s_dA, 1e-30), 1.0)
    A_new = A + lr * dA
    return A_new, {"accuracy": acc, "MAE": mae}


def _sweep_right(sites, w, phi, y_onehot, lr, weight_dec, T, cfg):
    """Center moves 0 -> N-1; sites end LEFT-isometric except the last."""
    N, M, D, _ = sites.shape
    B = phi.shape[0]
    dtype = sites.dtype
    e0 = boundary_vector(M, dtype=dtype)
    phi_t = phi.transpose(1, 0, 2)  # (N, B, D)

    # stale right environments with the label leg: R[n] closes sites
    # n+1..N-1 on w; R[N-1] = w.
    def renv_step(R, x):
        A, p = x
        mat = jnp.einsum("ldr,bd->blr", A, p)
        return jnp.einsum("blr,bro->blo", mat, R), None

    def renv_scan(R0, xs):
        def step(R, x):
            R_new, _ = renv_step(R, x)
            return R_new, R_new

        _, Rs = jax.lax.scan(step, R0, xs, reverse=True)
        return Rs

    R_last = jnp.broadcast_to(w, (B, M, w.shape[1]))
    Rs = renv_scan(R_last, (sites[1:], phi_t[1:]))  # (N-1, B, M, L)
    R_all = jnp.concatenate([Rs, R_last[None]], axis=0)  # R_all[n] for site n

    def step(carry, xsl):
        l_env, Rf = carry
        A_raw, x, r_envL, is_last = xsl
        A = jnp.einsum("lk,kdr->ldr", Rf, A_raw)  # absorb the carried R

        f = jnp.einsum("bl,bd,ldr,bro->ob", l_env, x, A, r_envL)
        A_new, metrics = _site_update(
            A, x, l_env, r_envL, y_onehot, f, lr, weight_dec, T, cfg
        )

        # exact center move: reduced QR over the (le,d) rows. The scale is
        # folded into the site as a SCALED isometry (A = gQ, carry R/g):
        # the carried environment keeps unit mean norm and the carried
        # factor stays O(1), so nothing accumulates exp(N) scale anywhere
        # (pure QR moves overflow float32 within one N~800 sweep).
        q, r = jnp.linalg.qr(A_new.reshape(M * D, M))
        env_q = jnp.einsum("bl,bd,ldr->br", l_env, x, q.reshape(M, D, M))
        if cfg.renorm:
            g = 1.0 / jnp.maximum(
                jnp.mean(jnp.linalg.norm(env_q, axis=1)), 1e-30
            )
        else:
            g = jnp.ones((), dtype=dtype)
        A_iso = (g * q).reshape(M, D, M)
        # last site keeps the center (no factor to pass on)
        A_out = jnp.where(is_last, A_new, A_iso)
        Rf_new = jnp.where(is_last, jnp.eye(M, dtype=dtype), r / g)
        l_env_new = jnp.where(
            is_last,
            jnp.einsum("bl,bd,ldr->br", l_env, x, A_new),
            env_q * g,
        )
        return (l_env_new, Rf_new), (A_out, metrics)

    is_last = jnp.zeros((N,), dtype=bool).at[N - 1].set(True)
    init = (jnp.broadcast_to(e0, (B, M)), jnp.eye(M, dtype=dtype))
    (l_full, _), (new_sites, metrics) = jax.lax.scan(
        step, init, (sites, phi_t, R_all, is_last)
    )

    if cfg.update_w:
        f = (l_full @ w).T
        f_act = apply_act_fn(f, cfg.act_fn, T)
        loss_der = loss_derivative(f_act, y_onehot, cfg.loss_fn, cfg.act_fn, T)
        dw = jnp.einsum("ob,br->ro", loss_der, l_full) - weight_dec * w
        s_w = jnp.sum(jnp.abs(w))
        s_dw = jnp.sum(jnp.abs(dw))
        dw = dw * jnp.where(s_dw > s_w, s_w / jnp.maximum(s_dw, 1e-30), 1.0)
        w = w + lr * dw

    return new_sites, w, metrics


def _sweep_left(sites, w, phi, y_onehot, lr, weight_dec, T, cfg):
    """Center moves N-1 -> 0; sites end RIGHT-isometric except the first."""
    N, M, D, _ = sites.shape
    B = phi.shape[0]
    dtype = sites.dtype
    e0 = boundary_vector(M, dtype=dtype)
    phi_t = phi.transpose(1, 0, 2)

    # stale left environments: L[n] = e0 . A_0(x) ... A_{n-1}(x), (B, M)
    def lenv_scan():
        v0 = jnp.broadcast_to(e0, (B, M))

        def step(v, x):
            A, p = x
            v_new = jnp.einsum("bl,bd,ldr->br", v, p, A)
            return v_new, v

        _, vs = jax.lax.scan(step, v0, (sites, phi_t))
        return vs  # vs[n] = env BEFORE site n

    L_all = lenv_scan()  # (N, B, M)

    def step(carry, xsl):
        r_envL, Rf = carry  # r_envL (B, M, L); Rf (M, M) absorbed from left
        A_raw, x, l_env, is_first = xsl
        A = jnp.einsum("ldk,kr->ldr", A_raw, Rf)

        f = jnp.einsum("bl,bd,ldr,bro->ob", l_env, x, A, r_envL)
        A_new, metrics = _site_update(
            A, x, l_env, r_envL, y_onehot, f, lr, weight_dec, T, cfg
        )

        # exact center move: LQ over the (d,ri) columns (QR of the
        # transpose), with the scaled-isometry gauge as in the right sweep
        qt, rt = jnp.linalg.qr(A_new.reshape(M, D * M).T)
        Q = qt.T.reshape(M, D, M)
        mat_q = jnp.einsum("ldr,bd->blr", Q, x)
        env_q = jnp.einsum("blr,bro->blo", mat_q, r_envL)
        if cfg.renorm:
            g = 1.0 / jnp.maximum(
                jnp.mean(jnp.linalg.norm(env_q.reshape(B, -1), axis=1)),
                1e-30,
            )
        else:
            g = jnp.ones((), dtype=dtype)
        A_iso = g * Q
        A_out = jnp.where(is_first, A_new, A_iso)
        Rf_new = jnp.where(is_first, jnp.eye(M, dtype=dtype), rt.T / g)
        r_envL_new = jnp.where(
            is_first,
            jnp.einsum(
                "blr,bro->blo",
                jnp.einsum("ldr,bd->blr", A_new, x),
                r_envL,
            ),
            env_q * g,
        )
        return (r_envL_new, Rf_new), (A_out, metrics)

    is_first = jnp.zeros((N,), dtype=bool).at[0].set(True)
    init = (jnp.broadcast_to(w, (B, M, w.shape[1])), jnp.eye(M, dtype=dtype))
    (_, _), (new_sites_rev, metrics) = jax.lax.scan(
        step, init, (sites, phi_t, L_all, is_first), reverse=True
    )

    if cfg.update_w:
        # full left environment through the updated chain
        v = jnp.broadcast_to(e0, (B, M))

        def fwd(v, x):
            A, p = x
            return jnp.einsum("bl,bd,ldr->br", v, p, A), None

        l_full, _ = jax.lax.scan(fwd, v, (new_sites_rev, phi_t))
        f = (l_full @ w).T
        f_act = apply_act_fn(f, cfg.act_fn, T)
        loss_der = loss_derivative(f_act, y_onehot, cfg.loss_fn, cfg.act_fn, T)
        dw = jnp.einsum("ob,br->ro", loss_der, l_full) - weight_dec * w
        s_w = jnp.sum(jnp.abs(w))
        s_dw = jnp.sum(jnp.abs(dw))
        dw = dw * jnp.where(s_dw > s_w, s_w / jnp.maximum(s_dw, 1e-30), 1.0)
        w = w + lr * dw

    return new_sites_rev, w, metrics


@partial(jax.jit, static_argnames=("T", "cfg", "left_dir"))
def _onesite_jit(sites, w, phi, y_onehot, lr, weight_dec, T, cfg, left_dir):
    body = _sweep_left if left_dir else _sweep_right
    if cfg.matmul_precision != "default":
        with jax.default_matmul_precision(cfg.matmul_precision):
            return body(sites, w, phi, y_onehot, lr, weight_dec, T, cfg)
    return body(sites, w, phi, y_onehot, lr, weight_dec, T, cfg)


def onesite_sweep(
    model: BoundaryMPS,
    phi: jnp.ndarray,
    y_onehot: jnp.ndarray,
    lr: float,
    weight_dec: float,
    left_dir: bool,
    cfg: OneSiteConfig = None,
):
    """One full one-site sweep; returns ``(model, metrics)`` with per-step
    ``accuracy``/``MAE`` series of length N."""
    if cfg is None:
        cfg = OneSiteConfig(act_fn=model.act_fn, loss_fn=model.loss_fn)
    sites, w, metrics = _onesite_jit(
        model.sites,
        model.w,
        phi.astype(model.dtype),
        y_onehot.astype(model.dtype),
        jnp.asarray(lr, dtype=model.dtype),
        jnp.asarray(weight_dec, dtype=model.dtype),
        model.T,
        cfg,
        left_dir,
    )
    return model.replace(sites=sites, w=w), metrics


def train_boundary_model(
    model: BoundaryMPS,
    train_loader,
    val_loader,
    lr,
    n_epochs: int,
    weight_dec: float = 1e-5,
    renorm: bool = None,
    lr_sweep_decay: float = 1.0,
    verbose: bool = False,
    checkpoint_path: str = None,
    resume: bool = False,
):
    """Epoch loop with alternating one-site sweep directions.

    ``lr`` may be a float or a callable ``epoch -> float``;
    ``lr_sweep_decay`` additionally multiplies the rate ONCE PER SWEEP
    (measured on long chains: a per-sweep geometric decay holds a stable
    fit where constant rates overshoot -- the effective schedule must
    track sweep count, not epochs, since each sweep is a full optimisation
    pass over all sites). Returns ``(model, val_acc list)``.

    With ``checkpoint_path``, the model plus the full schedule state
    (epoch, sweep counter, sweep direction) is saved after every epoch;
    ``resume=True`` continues an interrupted run from it.
    """
    import os

    import numpy as np

    from tensornetworkforml_tpu.models.boundary import boundary_forward
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.trainer import _loader_batches

    if renorm is None:
        renorm = model.N > 400
    cfg = OneSiteConfig(act_fn=model.act_fn, loss_fn=model.loss_fn,
                        renorm=renorm)
    lr_fn = lr if callable(lr) else (lambda _e: lr)
    val_acc = []
    left = False
    sweep_idx = 0
    start_epoch = 0
    if checkpoint_path and resume and os.path.exists(checkpoint_path):
        from tensornetworkforml_tpu.utils.checkpoint import (
            load_boundary_training_state,
        )

        model, start_epoch, sweep_idx, left = load_boundary_training_state(
            checkpoint_path, dtype=model.dtype
        )
        if verbose and start_epoch:
            print(f"resuming from epoch {start_epoch}")
    for epoch in range(start_epoch, n_epochs):
        for x, y in _loader_batches(train_loader):
            epoch_lr = float(lr_fn(epoch)) * (lr_sweep_decay ** sweep_idx)
            sweep_idx += 1
            phi = psi_embed(jnp.asarray(np.asarray(x), dtype=model.dtype))
            y = np.asarray(y)
            y1h = np.zeros((model.L, len(y)), dtype=np.float32)
            y1h[y, np.arange(len(y))] = 1.0
            model, _ = onesite_sweep(
                model, phi, jnp.asarray(y1h), epoch_lr, weight_dec, left, cfg
            )
            left = not left
        accs = []
        for x, y in _loader_batches(val_loader):
            phi = psi_embed(jnp.asarray(np.asarray(x), dtype=model.dtype))
            scores = boundary_forward(model, phi)
            accs.append(
                float(jnp.mean(jnp.argmax(scores, 0) == jnp.asarray(np.asarray(y))))
            )
        val_acc.append(float(np.mean(accs)) if accs else float("nan"))
        if verbose:
            print(f"epoch {epoch}: val {val_acc[-1]:.4f}")
        if checkpoint_path:
            from tensornetworkforml_tpu.utils.checkpoint import (
                save_boundary_training_state,
            )

            save_boundary_training_state(
                checkpoint_path, model, epoch + 1, sweep_idx, left
            )
    return model, val_acc
