"""Fused Pallas TPU kernel: the ENTIRE two-site DMRG step in one program.

Round-3 profiling (results/profile_sweep_ablation.json) left two floors
after the polar split kernel landed: ~39 us/step of everything-but-split
(~15 small XLA ops at ~2.5 us each) and the split kernel's own dispatch +
HBM round trips. This kernel fuses the WHOLE step of
``train/sweep.py::two_site_update`` -- merge, metrics, analytic gradient,
L1 clip, ascent update, f recompute, polar-NS canonical split, and the
left-environment extension -- into ONE Mosaic program per scan iteration.

Layout design (transpose-free): the label core is carried LABEL-MAJOR as
``lab (L, M*D, M)`` and every contraction is batched over the label index
o, so all tensors keep ``(rows=a*i, cols=j*c)`` matmul layouts end to end:

    merge        B3[o] = lab[o] @ A2                 (L matmuls)
    gradient     dB3[o] = (loss_der[o,b] * left)^T @ right
    f_new[o,b]   = sum_ai left[b,ai] * (B3'[o] @ right^T)[ai,b]
    sketch/Gram  Y += B3'[o] @ om[o];  G += B3'[o] @ B3'[o]^T
    split        polar-NS subspace iteration (ops/kernels/polar_split.py
                 math: row-sum prescale, quintic invariant on [0,1.101])
    right factor R[o] = Q^T @ B3'[o]   -- stays label-major for the next
                 scan step; Q reshapes to the new left site tensor.

Mosaic portability notes (bisected on hardware, round 3): the batch
factors ``left (B, M*D)`` / ``right (B, D*M)`` must NOT be built by a
lane-dimension broadcast+reshape or repeat/tile -- both crash the Mosaic
verifier on this toolchain. They are built as MXU matmuls against 0/1
expansion matrices generated in-kernel from ``broadcasted_iota``
(left = (lenv @ RL) * (x1 @ TL)); all refs are kept 2-D (the label axis
is flattened into rows and addressed with static slices), and per-label
rows of outputs are written directly rather than ``jnp.stack``-ed.

The reference computes this step as ~200 lines of sequential NumPy
(``Network_class.py:440-763``); the XLA scan port pays per-op latency.

Same validity domain as ``svd_method="polar"``: canonical gauge,
rank_mode="fixed", kept spectra <= ~2.5 decades; Mosaic compile crash at
M*D >= 384 rows (see ops/svd.py) applies here too, so M <= 128 flagship
shapes are the target.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensornetworkforml_tpu.ops.kernels.polar_split import (
    _PE_FINAL,
    _PE_LOOP,
    _colnorm,
    _dot,
    _pe_schedule,
    _polar_ns_greedy,
)

_HI = jax.lax.Precision.HIGHEST


def _expand_matmul_factors(n_small, d, n_out, major="small"):
    """0/1 expansion matrices for lane-dim expansion WITHOUT reshape.

    Returns ``(R (n_small, n_out), T (d, n_out))`` f32 such that for
    ``major='small'`` (out index = a*d + i):
        (v @ R)[b, a*d+i] = v[b, a]   and   (w @ T)[b, a*d+i] = w[b, i];
    for ``major='d'`` (out index = j*n_small + c) the roles flip.
    Built from ``broadcasted_iota`` so Mosaic never sees a lane reshape.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (n_small, n_out), 1)
    row_s = jax.lax.broadcasted_iota(jnp.int32, (n_small, n_out), 0)
    col_d = jax.lax.broadcasted_iota(jnp.int32, (d, n_out), 1)
    row_d = jax.lax.broadcasted_iota(jnp.int32, (d, n_out), 0)
    if major == "small":
        r = (col // d == row_s).astype(jnp.float32)
        t = (col_d % d == row_d).astype(jnp.float32)
    else:
        r = (col % n_small == row_s).astype(jnp.float32)
        t = (col_d // n_small == row_d).astype(jnp.float32)
    return r, t


def _step_kernel(
    lab_ref,      # (L*I, M)    label core, label-major rows, I = M*D
    a2_ref,       # (M, JC)     right neighbour, JC = D*M
    x1_ref,       # (B, D)
    x2_ref,       # (B, D)
    lenv_ref,     # (B, M)
    renv_ref,     # (B, M)
    y1h_ref,      # (L, B)
    f_ref,        # (L, B)
    om_ref,       # (L*JC, M)   label-sliced sketch matrix
    lr_ref,       # (1, 2) SMEM: lr, weight_dec
    # outputs
    aleft_ref,    # (I, M)
    labnew_ref,   # (L*M, JC)   next step's label core (label-major rows)
    lenv_new_ref,  # (B, M)
    fnew_ref,     # (L, B)
    metr_ref,     # (1, 4) SMEM: acc, mae, sum|B|, sum|dB|
    *,
    act_fn: str,
    loss_fn: str,
    T: float,
    renorm_envs: bool,
    growth_cap: float,
    dead_tol: float,
    loop_coeffs: tuple,
    final_coeffs: tuple,
):
    from tensornetworkforml_tpu.models.mps import (
        apply_act_fn,
        loss_derivative,
    )

    M = lenv_ref.shape[1]
    L, B = f_ref.shape
    D = x1_ref.shape[1]
    I = M * D
    JC = a2_ref.shape[1]
    lr = lr_ref[0, 0]
    wd = lr_ref[0, 1]

    f = f_ref[:, :]
    y1h = y1h_ref[:, :]
    f_act = apply_act_fn(f, act_fn, T)
    # accuracy via the one-hot/max trick (argmax lowering is avoided):
    # a sample counts as correct iff its TRUE label row attains the max
    # activation -- identical to argmax-agreement except on exact ties.
    fmax = jnp.max(f_act, axis=0, keepdims=True)
    hit = jnp.sum(y1h * (f_act >= fmax).astype(jnp.float32), axis=0)
    acc = jnp.mean((hit > 0.0).astype(jnp.float32))
    mae = jnp.mean(jnp.abs(y1h - f_act))
    loss_der = loss_derivative(f_act, y1h, loss_fn, act_fn, T)  # (L, B)

    # left/right batch factors: (B, I) and (B, JC) -- outer products of
    # the environment with the site input. Built MXU-side via 0/1
    # expansion matmuls (lane broadcast/reshape crashes Mosaic here).
    rl, tl = _expand_matmul_factors(M, D, I, major="small")
    rr, tr = _expand_matmul_factors(M, D, JC, major="d")
    left = _dot(lenv_ref[:, :], rl) * _dot(x1_ref[:, :], tl)    # (B, I)
    right = _dot(x2_ref[:, :], tr) * _dot(renv_ref[:, :], rr)   # (B, JC)

    a2 = a2_ref[:, :]

    # merge: ALL labels in one MXU matmul -- rows of lab are already
    # label-major (o, ai) blocks
    b3_all = _dot(lab_ref[:, :], a2)  # (L*I, JC)
    s_B = jnp.sum(jnp.abs(b3_all))

    # Gradient + f-recompute come in two shape-selected forms. BATCHED:
    # all labels in 3 big matmuls via iota-built row-expansion matrices
    # (sublane expansion kept in matmul form; lane expansion crashes
    # Mosaic) -- fastest, but its (L*I, B)/(L*I, JC) temporaries blow the
    # Mosaic compiler above ~2 MB each (L*I*B f32 at M=128/L=10/B=256
    # crashes; M=64 compiles -- bisected on hardware). LOOPED: per-label
    # small matmuls, ~flat VMEM, works at every M the polar split itself
    # supports.
    batched = (L * I * max(B, JC) * 4) <= 2 ** 21
    if batched:
        rowi = jax.lax.broadcasted_iota(jnp.int32, (L * I, 1), 0)
        el = (rowi // I == jax.lax.broadcasted_iota(
            jnp.int32, (L * I, L), 1)).astype(jnp.float32)     # (L*I, L)
        tl_m = (rowi % I == jax.lax.broadcasted_iota(
            jnp.int32, (L * I, I), 1)).astype(jnp.float32)     # (L*I, I)
        tile_left = _dot(tl_m, left, (((1,), (1,)), ((), ())))  # (L*I, B)
        wl = _dot(el, loss_der) * tile_left                    # (L*I, B)
        # plain weight decay folded into the raw gradient BEFORE the |dB|
        # sum and the clip, exactly like the XLA path (train/sweep.py:174)
        db3_all = _dot(wl, right) - wd * b3_all                # (L*I, JC)
    else:
        db3_all = None
        db3 = [
            _dot((loss_der[o, :][:, None] * left), right,
                 (((0,), (0,)), ((), ())))
            - wd * b3_all[o * I:(o + 1) * I, :]
            for o in range(L)
        ]

    if batched:
        s_dB = jnp.sum(jnp.abs(db3_all))
    else:
        s_dB = jnp.zeros((), jnp.float32)
        for o in range(L):
            s_dB += jnp.sum(jnp.abs(db3[o]))

    clip = jnp.where(s_dB > s_B, s_B / jnp.maximum(s_dB, 1e-30), 1.0)
    step = lr * clip
    if batched:
        bn_all = b3_all + step * db3_all
    else:
        bn_list = [
            b3_all[o * I:(o + 1) * I, :] + step * db3[o] for o in range(L)
        ]

    if growth_cap > 0:
        if batched:
            s_new = jnp.sum(jnp.abs(bn_all))
        else:
            s_new = jnp.zeros((), jnp.float32)
            for o in range(L):
                s_new += jnp.sum(jnp.abs(bn_list[o]))
        cap = (1.0 + growth_cap) * s_B
        g_sc = jnp.where(s_new > cap, cap / jnp.maximum(s_new, 1e-30), 1.0)
        if batched:
            bn_all = bn_all * g_sc
        else:
            bn_list = [bn_list[o] * g_sc for o in range(L)]

    # f recompute with the updated B (stale right env):
    # f_new[o,b] = sum_ai left[b,ai] * (bn[o] @ right^T)[ai,b]
    if batched:
        tall = _dot(bn_all, right, (((1,), (1,)), ((), ())))   # (L*I, B)
        fnew_ref[:, :] = _dot(el, tall * tile_left,
                              (((0,), (0,)), ((), ())))        # (L, B)
        bn = [bn_all[o * I:(o + 1) * I, :] for o in range(L)]
        n2 = jnp.sum(bn_all * bn_all)
    else:
        bn = bn_list
        n2 = jnp.zeros((), jnp.float32)
        for o in range(L):
            t_o = _dot(bn[o], right, (((1,), (1,)), ((), ())))  # (I, B)
            fnew_ref[o, :] = jnp.sum(left * t_o.T, axis=1)
            n2 += jnp.sum(bn[o] * bn[o])

    # polar-NS canonical split of bmat (I, L*JC), accumulated label-major
    y = jnp.zeros((I, M), jnp.float32)
    g = jnp.zeros((I, I), jnp.float32)
    for o in range(L):
        y += _dot(bn[o], om_ref[o * JC:(o + 1) * JC, :])
        g += _dot(bn[o], bn[o], (((1,), (1,)), ((), ())))
    g = g / jnp.maximum(n2, 1e-30)
    y = _colnorm(y, dead_tol)
    y = _polar_ns_greedy(y, loop_coeffs)
    y = _dot(g, y)
    y = _colnorm(y, dead_tol)
    q = _polar_ns_greedy(y, final_coeffs)  # (I, M)

    lenv_new = _dot(left, q)  # (B, M)
    if renorm_envs:
        gg = 1.0 / jnp.maximum(
            jnp.mean(jnp.sqrt(jnp.sum(lenv_new * lenv_new, axis=1))), 1e-30
        )
        q_out = q * gg
        lenv_new = lenv_new * gg
        inv = 1.0 / gg
    else:
        q_out = q
        inv = jnp.float32(1.0)

    aleft_ref[:, :] = q_out
    lenv_new_ref[:, :] = lenv_new
    for o in range(L):
        labnew_ref[o * M:(o + 1) * M, :] = inv * _dot(
            q, bn[o], (((0,), (0,)), ((), ()))
        )  # (M, JC)

    metr_ref[0, 0] = acc
    metr_ref[0, 1] = mae
    metr_ref[0, 2] = s_B
    metr_ref[0, 3] = s_dB


@functools.partial(
    jax.jit,
    static_argnames=(
        "act_fn", "loss_fn", "T", "renorm_envs", "growth_cap", "interpret",
    ),
)
def two_site_step_pallas(
    lab,        # (L, M*D, M) label-major carried core
    a2,         # (M, D, M)
    x1, x2,     # (B, D)
    lenv, renv,  # (B, M)
    y1h, f,     # (L, B)
    lr,
    weight_dec=0.0,
    act_fn: str = "linear",
    loss_fn: str = "MSE",
    T: float = 0.1,
    renorm_envs: bool = False,
    growth_cap: float = 0.0,
    interpret: bool = False,
):
    """One fused two-site step. Returns ``(a_left (M*D, M), lab_new
    (L, M, D*M), lenv_new (B, M), f_new (L, B), metrics (1, 4))``.

    ``lab`` uses the label-major kernel layout; convert from the standard
    ``label_site (M, D, L, M)`` with ``label_to_kernel_layout`` once per
    sweep (the scan carries the kernel layout).
    """
    from tensornetworkforml_tpu.ops.svd import _rangefinder_omega

    L, I, M = lab.shape
    B, D = x1.shape
    JC = D * M
    dead_tol = 1e-6
    # the SAME omega the standalone polar split uses for a (I, L*JC)
    # matrix; kept 2-D (L*JC, M) -- the kernel slices per-label row blocks
    om = _rangefinder_omega(L * JC, M, jnp.float32)
    lr_arr = jnp.stack([
        jnp.asarray(lr, jnp.float32).reshape(()),
        jnp.asarray(weight_dec, jnp.float32).reshape(()),
    ]).reshape(1, 2)

    kernel = functools.partial(
        _step_kernel,
        act_fn=act_fn, loss_fn=loss_fn, T=T,
        renorm_envs=renorm_envs, growth_cap=growth_cap,
        dead_tol=dead_tol,
        loop_coeffs=_pe_schedule(*_PE_LOOP),
        final_coeffs=_pe_schedule(*_PE_FINAL),
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    a_left, lab_new2, lenv_new, f_new, metrics = pl.pallas_call(
        kernel,
        in_specs=[
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
            vmem(),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            vmem(), vmem(), vmem(), vmem(),
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((I, M), jnp.float32),
            jax.ShapeDtypeStruct((L * M, JC), jnp.float32),
            jax.ShapeDtypeStruct((B, M), jnp.float32),
            jax.ShapeDtypeStruct((L, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ),
        interpret=interpret,
    )(
        lab.reshape(L * I, M), a2.reshape(M, JC), x1, x2, lenv, renv,
        y1h, f, om, lr_arr,
    )
    return a_left, lab_new2.reshape(L, M, JC), lenv_new, f_new, metrics


def label_to_kernel_layout(label_site):
    """``(M, D, L, M) -> (L, M*D, M)`` (label-major rows = (a, i))."""
    M, D, L, M2 = label_site.shape
    return label_site.transpose(2, 0, 1, 3).reshape(L, M * D, M2)


def label_from_kernel_layout(lab_new):
    """``(L, M, D*M) -> (M, D, L, M)`` (the sweep's standard layout)."""
    L, M, JC = lab_new.shape
    D = JC // M
    return lab_new.reshape(L, M, D, M).transpose(1, 2, 0, 3)
