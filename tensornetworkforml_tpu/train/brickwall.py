"""Brick-wall parallel-bond training: every two-site update in a layer at once.

DMRG sweeps are intrinsically sequential: N-1 dependent steps per batch,
each one a small-matrix latency party that leaves the MXU idle (the
reference's ``sweep``/``sweep_step`` loop, ``Network_class.py:384-573``,
and our scanned port in ``train/sweep.py`` share this shape). This module
is the TPU-first alternative: a **brick-wall layer** updates ALL disjoint
two-site pairs simultaneously --

    even layer:  (0,1) (2,3) (4,5) ...
    odd  layer:  (1,2) (3,4) (5,6) ...

Each pair's gradient uses the environments of the CURRENT chain (computed
once per layer by two scans), so a layer is a block-Jacobi step: the exact
two-site DMRG update for every pair, holding the other pairs fixed. One
brick sweep = even layer + odd layer (+ one output-projection update), so
every bond is updated once -- like a sweep, but with scan depth O(N) only
inside two environment scans, while ALL merges, gradients, clips, and
truncated splits run as K = N/2 BATCHED problems on the MXU. The batched
split is matmul/Cholesky-only (``ops/svd.py::batched_cholqr_split``; a
vmapped rangefinder option exists but pays XLA's batched qr+eigh, measured
3.4x slower at M=32 and 5.1x at M=128).

This trades the sweep's Gauss-Seidel freshness (each step sees the
previous step's update) for ~K-way parallelism; measured on the tasks in
``tests/test_brickwall.py`` the per-update quality is equivalent at
moderate learning rates. The model family is the boundary-label MPS
(``models/boundary.py``): a traveling label leg would serialise the layer
again, a fixed output projection does not.

Scale discipline: pair splits are canonical (isometric left factor), and
``renorm=True`` re-balances each pair's weight EVENLY between its two
factors (the reference's sqrt(S)-sharing, per pair) -- purely local and
exactly function-preserving, so no tensor anywhere accumulates more than
its own pair's weight at any chain length. (A global fold-into-w renorm
was measured to overflow float32 at N=784: the product of K=392 per-pair
scales is exponential in N.) Like the sequential engines, clipped updates
are lr-relative per pair, so a layer can grow the function by up to
(1+lr)^K: keep lr ~ O(1/K) on long chains (same finding as the two-site
N-scaled rate, BENCH_NOTES.md).

No reference analogue (the reference is sequential NumPy end to end);
the per-pair update semantics follow its ``update_B``
(``Network_class.py:577-763``: analytic gradient, L1 clip, ascent step).
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.models.boundary import BoundaryMPS
from tensornetworkforml_tpu.models.mps import apply_act_fn, loss_derivative
from tensornetworkforml_tpu.ops.contractions import boundary_vector
from tensornetworkforml_tpu.ops.svd import (
    _rangefinder_split,
    batched_cholqr_split,
)


class BrickConfig(NamedTuple):
    act_fn: str = "linear"
    loss_fn: str = "MSE"
    update_w: bool = True
    # balance each pair's weight evenly between its two factors
    # (function-preserving, local); keeps every site tensor bounded by its
    # own pair's weight at any chain length
    renorm: bool = True
    # max fractional growth of sum|B| per pair update (0 = unlimited)
    growth_cap: float = 0.0
    matmul_precision: str = "default"
    # "cholqr": batched matmul/Cholesky-only splits (ops/svd.py::
    #   batched_cholqr_split) -- the fast path, 3.4x the vmapped
    #   rangefinder at M=32 with equivalent capture (the split is the
    #   layer's dominant cost).
    # "rangefinder": vmapped ops/svd.py::_rangefinder_split (qr+eigh);
    #   exact per-pair match to the sequential engines' split.
    split_method: str = "cholqr"
    # Function-space line search (round-3): the lr*K <= 0.25 stability law
    # exists because K simultaneous lr-relative pair steps share one STALE
    # output -- each pushes f the same way and the aggregate overshoots by
    # ~K. Instead of damping by hand, compute the layer's linearized
    # aggregate response dF = sum_k df_k (one extra batched einsum) and
    # take the 1-D-optimal global step gamma* = <dF, loss_der>/|dF|^2
    # (exact for linear/MSE; Gauss-Newton-style for the other losses),
    # clamped to [0, `lr`] -- `lr` becomes a safety CAP, not the step.
    line_search: bool = False
    # over-relaxation on the line-searched step (SOR): gamma_used =
    # relax * gamma*. 1.0 = exact minimizer of the linearized batch loss
    # (never overshoots, but conservative); values in (1, 2) trade a
    # little overshoot for faster residual decay.
    line_search_relax: float = 1.0
    # step floor, as a fraction of `lr`, applied ONLY when the
    # linearized descent test fails (<dF, loss_der> <= 0): there the
    # weight-decay term dominates the clipped direction and an unfloored
    # line search takes a ZERO step -- silently stalling the layer
    # (visible only through the 'gamma' metric). The floor keeps a small
    # fixed step in that regime so regularisation still applies and
    # training cannot deadlock; legitimately tiny minimizers near
    # convergence are NOT floored. 0.0 disables the floor entirely.
    line_search_floor: float = 0.05


def _env_stacks(sites, w, phi_t, e0):
    """Left envs before each site (N,B,M) and right envs after each site
    closing on ``w`` (N,B,M,L); plus the full-chain left env (B,M)."""
    B_sz = phi_t.shape[1]
    M = sites.shape[1]

    def lstep(v, x):
        A, p = x
        v_new = jnp.einsum("bl,bd,ldr->br", v, p, A)
        return v_new, v

    v0 = jnp.broadcast_to(e0, (B_sz, M))
    l_full, L_all = jax.lax.scan(lstep, v0, (sites, phi_t))

    def rstep(R, x):
        A, p = x
        mat = jnp.einsum("ldr,bd->blr", A, p)
        R_new = jnp.einsum("blr,bro->blo", mat, R)
        return R_new, R_new

    R_last = jnp.broadcast_to(w, (B_sz, M, w.shape[1]))
    _, Rs = jax.lax.scan(rstep, R_last, (sites[1:], phi_t[1:]), reverse=True)
    R_all = jnp.concatenate([Rs, R_last[None]], axis=0)  # R_all[n] for site n
    return L_all, R_all, l_full


def _brick_layer(sites, w, phi_t, y_onehot, lr, weight_dec, parity, cfg, T):
    """One brick-wall layer: batched two-site updates on all pairs starting
    at ``parity`` (0 = even bonds, 1 = odd bonds). Returns
    ``(new_sites, metrics)``."""
    N, M, D, _ = sites.shape
    dtype = sites.dtype
    K = (N - parity) // 2
    e0 = boundary_vector(M, dtype=dtype)

    L_all, R_all, l_full = _env_stacks(sites, w, phi_t, e0)
    f = (l_full @ w).T  # (L, B) current scores (pre-update, whole layer)

    f_act = apply_act_fn(f, cfg.act_fn, T)
    y_true = jnp.argmax(y_onehot, axis=0)
    acc = jnp.mean((jnp.argmax(f_act, axis=0) == y_true).astype(dtype))
    mae = jnp.mean(jnp.abs(y_onehot - f_act))
    loss_der = loss_derivative(f_act, y_onehot, cfg.loss_fn, cfg.act_fn, T)

    lo, hi = parity, parity + 2 * K
    A1 = sites[lo:hi:2]  # (K,M,D,M)
    A2 = sites[lo + 1 : hi : 2]
    x1 = phi_t[lo:hi:2]  # (K,B,D)
    x2 = phi_t[lo + 1 : hi : 2]
    Lk = L_all[lo:hi:2]  # (K,B,M) env before the pair
    Rk = R_all[lo + 1 : hi : 2]  # (K,B,M,L) env after the pair

    # merge + batched analytic gradient (reference update_B semantics,
    # Network_class.py:577-763, vectorised over all K pairs)
    B_t = jnp.einsum("kaim,kmjc->kaijc", A1, A2)  # (K,M,D,D,M)
    u = jnp.einsum("ob,kbco->kbc", loss_der, Rk)  # label leg closed on w
    left_part = jnp.einsum("kba,kbi->kbai", Lk, x1)
    right_part = jnp.einsum("kbj,kbc->kbjc", x2, u)
    deltaB = jnp.einsum("kbai,kbjc->kaijc", left_part, right_part)
    deltaB = deltaB - weight_dec * B_t

    # per-pair L1 clip (Network_class.py:753-757) + ascent step
    s_B = jnp.sum(jnp.abs(B_t), axis=(1, 2, 3, 4))
    s_dB = jnp.sum(jnp.abs(deltaB), axis=(1, 2, 3, 4))
    scale = jnp.where(s_dB > s_B, s_B / jnp.maximum(s_dB, 1e-30), 1.0)
    direction = scale[:, None, None, None, None] * deltaB
    if cfg.line_search:
        # linearized aggregate response of the whole layer: df(o,b) =
        # sum_k L_k . direction_k . (x1, x2) . R_k  -- then the 1-D
        # optimal global step on <loss_der, df> with unit curvature
        t1 = jnp.einsum("kbai,kaijc->kbjc", left_part, direction)
        t2 = jnp.einsum("kbjc,kbj->kbc", t1, x2)
        dF = jnp.einsum("kbc,kbco->ob", t2, Rk)
        num = jnp.sum(dF * loss_der)
        den = jnp.maximum(jnp.sum(dF * dF), 1e-30)
        # Floor ONLY the num <= 0 regime (weight decay dominating the
        # clipped direction -- the line search says "step increases
        # loss", which deadlocks regularisation). A legitimately tiny
        # minimizer near convergence keeps its unfloored value so the
        # layer can settle instead of limit-cycling at 0.05*lr.
        gamma_raw = jnp.clip(cfg.line_search_relax * num / den, 0.0, lr)
        gamma = jnp.where(num <= 0, cfg.line_search_floor * lr, gamma_raw)
        step = gamma
    else:
        gamma = lr * jnp.ones((), dtype=dtype)
        step = lr
    B_new = B_t + step * direction
    if cfg.growth_cap > 0:
        s_new = jnp.sum(jnp.abs(B_new), axis=(1, 2, 3, 4))
        cap = (1.0 + cfg.growth_cap) * s_B
        g = jnp.where(s_new > cap, cap / jnp.maximum(s_new, 1e-30), 1.0)
        B_new = B_new * g[:, None, None, None, None]

    # batched canonical truncated split: all K pairs at once
    bmats = B_new.reshape(K, M * D, D * M)
    if cfg.split_method == "cholqr":
        q, r = batched_cholqr_split(bmats, M)
    else:
        q, r = jax.vmap(
            lambda b: _rangefinder_split(b, M, split_mode="canonical")
        )(bmats)
    A1_new = q.reshape(K, M, D, M).astype(dtype)
    A2_new = r.reshape(K, M, D, M).astype(dtype)

    if cfg.renorm:
        # Balance each pair's scale between its two factors (the
        # reference's sqrt(S)-sharing idea, Network_class.py:871, applied
        # per pair): after a canonical split the right factor carries ALL
        # pair weight rho_k, so raw splits transport weight rightward
        # every layer, and the earlier fold-into-w variant accumulated
        # prod(g_k) in the output projection -- exponential in N and
        # measured to OVERFLOW float32 at N=784 (K=392 factors). Balancing
        # is purely LOCAL: left = Q*s_k, right = right/s_k with
        # s_k = sqrt(rho_k/sqrt(M)), so both factors get norm
        # sqrt(rho_k*sqrt(M)), the function is exactly preserved, and no
        # tensor anywhere absorbs more than its own pair's weight.
        rho = jnp.sqrt(jnp.sum(A2_new**2, axis=(1, 2, 3)))
        s = jnp.sqrt(
            jnp.maximum(rho, 1e-30) / jnp.sqrt(jnp.asarray(M, dtype))
        )
        A1_new = A1_new * s[:, None, None, None]
        A2_new = A2_new / s[:, None, None, None]

    new_sites = sites.at[lo:hi:2].set(A1_new).at[lo + 1 : hi : 2].set(A2_new)
    metrics = {"accuracy": acc, "MAE": mae, "gamma": gamma}
    return new_sites, metrics


def _w_update(sites, w, phi_t, y_onehot, lr, weight_dec, cfg, T, e0):
    from tensornetworkforml_tpu.ops.contractions import left_env_final_fused

    l_full = left_env_final_fused(sites, phi_t, e0)  # (B, M)
    f = (l_full @ w).T
    f_act = apply_act_fn(f, cfg.act_fn, T)
    loss_der = loss_derivative(f_act, y_onehot, cfg.loss_fn, cfg.act_fn, T)
    dw = jnp.einsum("ob,br->ro", loss_der, l_full) - weight_dec * w
    s_w = jnp.sum(jnp.abs(w))
    s_dw = jnp.sum(jnp.abs(dw))
    dw = dw * jnp.where(s_dw > s_w, s_w / jnp.maximum(s_dw, 1e-30), 1.0)
    return w + lr * dw


def _brick_sweep_body(sites, w, phi, y_onehot, lr, weight_dec, T, cfg):
    phi_t = phi.transpose(1, 0, 2)  # (N, B, D)
    sites, metrics = _brick_layer(
        sites, w, phi_t, y_onehot, lr, weight_dec, 0, cfg, T
    )
    if sites.shape[0] >= 3:  # the odd layer exists only past two sites
        sites, _ = _brick_layer(
            sites, w, phi_t, y_onehot, lr, weight_dec, 1, cfg, T
        )
    if cfg.update_w:
        e0 = boundary_vector(sites.shape[1], dtype=sites.dtype)
        w = _w_update(sites, w, phi_t, y_onehot, lr, weight_dec, cfg, T, e0)
    return sites, w, metrics


def _brick_epoch_body(sites, w, phi_epoch, y1h_epoch, lr, weight_dec, T, cfg):
    """Whole epoch of brick sweeps as ONE program: a ``lax.scan`` over
    batches (the brick analogue of ``train/epoch.py::fused_epoch``; on the
    ~40 ms-per-dispatch tunnel one dispatch per epoch is the difference
    between device-bound and latency-bound training)."""

    def body(carry, xy):
        sites, w = carry
        phi, y1h = xy
        sites, w, metrics = _brick_sweep_body(
            sites, w, phi, y1h, lr, weight_dec, T, cfg
        )
        return (sites, w), metrics

    (sites, w), metrics = jax.lax.scan(body, (sites, w), (phi_epoch, y1h_epoch))
    return sites, w, metrics


@partial(jax.jit, static_argnames=("T", "cfg"))
def _brick_epoch_jit(sites, w, phi_epoch, y1h_epoch, lr, weight_dec, T, cfg):
    if cfg.matmul_precision != "default":
        with jax.default_matmul_precision(cfg.matmul_precision):
            return _brick_epoch_body(
                sites, w, phi_epoch, y1h_epoch, lr, weight_dec, T, cfg
            )
    return _brick_epoch_body(sites, w, phi_epoch, y1h_epoch, lr, weight_dec,
                             T, cfg)


def brick_epoch(
    model: BoundaryMPS,
    x_epoch,
    y_epoch,
    lr: float,
    weight_dec: float,
    cfg: BrickConfig = None,
    mesh=None,
):
    """One fused epoch: ``x_epoch (n_batches, B, N)`` raw pixels,
    ``y_epoch (n_batches, B)`` integer labels. Returns
    ``(model, metrics)`` with per-batch pre-update metric series.

    With ``mesh``, the per-batch axis is sharded over the mesh's ``data``
    axis (data parallelism inside ONE whole-epoch program: GSPMD emits one
    psum per brick layer for all pair gradients)."""
    from tensornetworkforml_tpu.ops.embedding import psi_embed

    if cfg is None:
        cfg = BrickConfig(act_fn=model.act_fn, loss_fn=model.loss_fn)
    x_epoch = jnp.asarray(x_epoch, dtype=model.dtype)
    phi_epoch = psi_embed(x_epoch)
    y_epoch = jnp.asarray(y_epoch)
    y1h = jax.nn.one_hot(y_epoch, model.L, dtype=model.dtype).transpose(
        0, 2, 1
    )  # (n_batches, L, B)
    args = (
        model.sites,
        model.w,
        phi_epoch,
        y1h,
        jnp.asarray(lr, dtype=model.dtype),
        jnp.asarray(weight_dec, dtype=model.dtype),
    )
    if mesh is not None:
        fn = _sharded_epoch_fn(mesh, model.T, cfg)
        sites, w, metrics = fn(*args)
    else:
        sites, w, metrics = _brick_epoch_jit(*args, model.T, cfg)
    return model.replace(sites=sites, w=w), metrics


@_lru_cache(maxsize=8)
def _sharded_epoch_fn(mesh, T, cfg):
    """Compile (once per (mesh, T, cfg)) the mesh-sharded whole-epoch
    program -- a fresh jit per call would re-trace every epoch. Bounded:
    an unbounded cache would pin every Mesh + compiled epoch program for
    the process lifetime under lr/config scans."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tensornetworkforml_tpu.parallel.mesh import DATA_AXIS

    repl = NamedSharding(mesh, P())
    phi_sh = NamedSharding(mesh, P(None, DATA_AXIS, None, None))
    y_sh = NamedSharding(mesh, P(None, None, DATA_AXIS))

    def body(sites, w, phi_e, y_e, lr_, wd_):
        if cfg.matmul_precision != "default":
            with jax.default_matmul_precision(cfg.matmul_precision):
                return _brick_epoch_body(sites, w, phi_e, y_e, lr_, wd_, T,
                                         cfg)
        return _brick_epoch_body(sites, w, phi_e, y_e, lr_, wd_, T, cfg)

    return jax.jit(
        body,
        in_shardings=(repl, repl, phi_sh, y_sh, repl, repl),
        out_shardings=(repl, repl, repl),
    )


@partial(jax.jit, static_argnames=("T", "cfg"))
def _brick_jit(sites, w, phi, y_onehot, lr, weight_dec, T, cfg):
    if cfg.matmul_precision != "default":
        with jax.default_matmul_precision(cfg.matmul_precision):
            return _brick_sweep_body(
                sites, w, phi, y_onehot, lr, weight_dec, T, cfg
            )
    return _brick_sweep_body(sites, w, phi, y_onehot, lr, weight_dec, T, cfg)


def brick_sweep(
    model: BoundaryMPS,
    phi: jnp.ndarray,
    y_onehot: jnp.ndarray,
    lr: float,
    weight_dec: float,
    cfg: BrickConfig = None,
):
    """One brick sweep (even layer + odd layer + w update) on one batch.

    Returns ``(model, metrics)``; ``metrics["accuracy"]``/``["MAE"]`` are
    computed on the pre-update scores, as the reference's loop does."""
    if cfg is None:
        cfg = BrickConfig(act_fn=model.act_fn, loss_fn=model.loss_fn)
    sites, w, metrics = _brick_jit(
        model.sites,
        model.w,
        phi.astype(model.dtype),
        y_onehot.astype(model.dtype),
        jnp.asarray(lr, dtype=model.dtype),
        jnp.asarray(weight_dec, dtype=model.dtype),
        model.T,
        cfg,
    )
    return model.replace(sites=sites, w=w), metrics


def make_sharded_brick_step(mesh, T: float, cfg: BrickConfig):
    """Compile a data-parallel brick sweep over ``mesh``.

    The batch axis of ``phi (B,N,D)`` / ``y_onehot (L,B)`` is sharded over
    the ``data`` mesh axis; parameters stay replicated. Every per-pair
    gradient contracts out the batch leg, so GSPMD inserts ONE psum per
    brick layer for ALL pairs at once (the sequential sweep needs one per
    step) -- the brick's communication depth per sweep is O(1).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tensornetworkforml_tpu.parallel.mesh import DATA_AXIS

    repl = NamedSharding(mesh, P())
    phi_sh = NamedSharding(mesh, P(DATA_AXIS, None, None))
    y_sh = NamedSharding(mesh, P(None, DATA_AXIS))

    def fn(sites, w, phi, y_onehot, lr, weight_dec):
        if cfg.matmul_precision != "default":
            with jax.default_matmul_precision(cfg.matmul_precision):
                return _brick_sweep_body(
                    sites, w, phi, y_onehot, lr, weight_dec, T, cfg
                )
        return _brick_sweep_body(sites, w, phi, y_onehot, lr, weight_dec, T,
                                 cfg)

    return jax.jit(
        fn,
        in_shardings=(repl, repl, phi_sh, y_sh, repl, repl),
        out_shardings=(repl, repl, repl),
    )


def train_brickwall(
    model: BoundaryMPS,
    train_loader,
    val_loader,
    lr,
    n_epochs: int,
    weight_dec: float = 1e-5,
    lr_sweep_decay: float = 1.0,
    verbose: bool = False,
    bond_schedule: dict = None,
    checkpoint_path: str = None,
    resume: bool = False,
    cfg: BrickConfig = None,
):
    """Epoch loop over brick sweeps. ``lr`` may be a float or a callable
    ``epoch -> float``; ``lr_sweep_decay`` multiplies the rate once per
    brick sweep. Returns ``(model, val_acc list)``.

    ``cfg`` overrides the full ``BrickConfig`` (split_method, renorm,
    growth_cap, matmul_precision); by default it is built from the
    model's act/loss functions.

    ``bond_schedule`` maps ``epoch -> M``: the model grows to bond
    dimension M at the start of that epoch (zero-padded embedding,
    function preserved exactly; one re-jit per growth — see
    ``models.boundary.grow_boundary_bond``). With ``checkpoint_path`` the
    model + epoch counter is saved after every epoch; ``resume=True``
    continues an interrupted run.

    Long chains: a brick layer applies K = N/2 clipped lr-relative pair
    updates multiplicatively, so keep ``lr`` of order ``0.5/N`` past
    N ~ a few hundred (cf. the two-site N-scaled rate, BENCH_NOTES.md).
    """
    import os

    import numpy as np

    from tensornetworkforml_tpu.models.boundary import (
        boundary_forward,
        grow_boundary_bond,
    )
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.trainer import _loader_batches

    if cfg is None:
        cfg = BrickConfig(act_fn=model.act_fn, loss_fn=model.loss_fn)
    lr_fn = lr if callable(lr) else (lambda _e: lr)
    val_acc = []
    sweep_idx = 0
    start_epoch = 0
    if checkpoint_path and resume and os.path.exists(checkpoint_path):
        from tensornetworkforml_tpu.utils.checkpoint import (
            load_boundary_training_state,
        )

        model, start_epoch, sweep_idx, _ = load_boundary_training_state(
            checkpoint_path, dtype=model.dtype
        )
        if verbose and start_epoch:
            print(f"resuming from epoch {start_epoch}")
    for epoch in range(start_epoch, n_epochs):
        if bond_schedule and epoch in bond_schedule:
            model = grow_boundary_bond(model, int(bond_schedule[epoch]))
            if verbose:
                print(f"epoch {epoch}: bond dimension grown to {model.M}")
        batches = list(_loader_batches(train_loader))
        shapes = {np.asarray(x).shape for x, _ in batches}
        if len(shapes) == 1 and lr_sweep_decay == 1.0:
            # uniform batches + constant in-epoch rate: ONE fused dispatch
            x_ep = np.stack([np.asarray(x) for x, _ in batches])
            y_ep = np.stack([np.asarray(y) for _, y in batches])
            model, _ = brick_epoch(
                model, x_ep, y_ep, float(lr_fn(epoch)), weight_dec, cfg
            )
            sweep_idx += len(batches)
        else:
            for x, y in batches:
                step_lr = float(lr_fn(epoch)) * (lr_sweep_decay**sweep_idx)
                sweep_idx += 1
                phi = psi_embed(jnp.asarray(np.asarray(x), dtype=model.dtype))
                y = np.asarray(y)
                y1h = np.zeros((model.L, len(y)), dtype=np.float32)
                y1h[y, np.arange(len(y))] = 1.0
                model, _ = brick_sweep(
                    model, phi, jnp.asarray(y1h), step_lr, weight_dec, cfg
                )
        accs = []
        for x, y in _loader_batches(val_loader):
            phi = psi_embed(jnp.asarray(np.asarray(x), dtype=model.dtype))
            scores = boundary_forward(model, phi)
            accs.append(
                float(
                    jnp.mean(jnp.argmax(scores, 0) == jnp.asarray(np.asarray(y)))
                )
            )
        val_acc.append(float(np.mean(accs)) if accs else float("nan"))
        if verbose:
            print(f"epoch {epoch}: val {val_acc[-1]:.4f}")
        if checkpoint_path:
            from tensornetworkforml_tpu.utils.checkpoint import (
                save_boundary_training_state,
            )

            save_boundary_training_state(
                checkpoint_path, model, epoch + 1, sweep_idx, False
            )
    return model, val_acc
