"""Fused two-site PRE-SPLIT kernel: everything between the carried
environments and the subspace iteration, in ONE Mosaic program.

Round-5 profiling (results/m512_profile.json) put the flagship step
(N=196 M=128 L=10 B=256) at 81.7 us against a 39 us everything-but-split
floor made of ~15 latency-bound XLA ops (~2.5 us each,
results/profile_sweep_ablation.json). This kernel replaces the XLA ops of
the reference's ``sweep_step``/``update_B`` semantics
(``Network_class.py:440-763``) -- merge, analytic gradient, weight decay,
L1 clip, ascent update, output recompute -- AND the split's two J-carrying
reductions (sketch ``Y0 = B_new @ Omega``, Gram ``G = B_new B_new^T``)
with one program; the serial subspace iteration stays in the existing
``polar_iterate_pallas`` kernel and ``R = Q^T B_new`` is one batched XLA
matmul.

Layout design (the reason this composes without transposes): the label
core is carried as ``(L, I, Mk)`` with ``I = M*D`` rows ``(a, i)`` and
``Mk = M`` the shared bond -- and the step's OUTPUT ``R = Q^T B_new``,
computed per label block as ``(L, M, D*M)`` = ``(o, a', (i', k'))``, is
the SAME memory order viewed as ``(L, I', Mk')`` for the next step (a
free reshape). The two-site matrix is held as per-label column blocks
``B_new (L, I, D*M)``; its column order ``(o, j, c)`` matches the flat
``(I, L*D*M)`` matrix the XLA path splits, so the SAME ``Omega`` (sliced
per block) gives the same sketch.

In-kernel expansions avoid Mosaic-hostile reshapes: ``left_part[b,(a,i)]
= l_env[b,a] * x1[b,i]`` is built as ``(l_env @ E_a) * (x1 @ E_i)`` with
0/1 expander matrices constructed from 2-D iotas (supported), likewise
``right_part`` from ``(x2, r_env)``.

Constraints (same family as the fused step engine): canonical split,
L2_flag=False (plain weight decay), rank_mode='fixed',
update_mode='clip', float32 storage. Single-block form: needs
``3 * L*I*(D*M) * 4`` bytes of VMEM for the block stacks -- M <= 128 at
L = 10 (the flagship family); larger bonds keep the streaming gramfree
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensornetworkforml_tpu.ops.kernels.polar_split import _DN, _DN_T, _dot

_PREC_DEFAULT = jax.lax.Precision.DEFAULT


def _expander(n_src: int, n_dst: int, mode: str, dtype=jnp.float32):
    """0/1 expansion matrix built from 2-D iotas (Mosaic-supported).

    ``mode="repeat"``: dst position s maps to src ``s // rep`` (each source
    index repeated ``rep = n_dst // n_src`` times -- the ``(a) -> (a, i)``
    row expansion). ``mode="tile"``: dst position s maps to src
    ``s % n_src`` (the ``(i) -> (a, i)`` tiling).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_src, n_dst), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_src, n_dst), 1)
    if mode == "repeat":
        rep = n_dst // n_src
        return (cols // rep == rows).astype(dtype)
    return (cols % n_src == rows).astype(dtype)


def _presplit_kernel(
    lab_ref, a2_ref, x1_ref, x2_ref, le_ref, re_ref, y_ref, f_ref,
    om_ref, lr_ref, wd_ref,
    bnew_ref, y0_ref, g_ref, fnew_ref, lp_ref, stats_ref,
    bt_scr, db_scr,
    *, act_fn: str, loss_fn: str, T: float, with_gram: bool,
):
    L, I, Mk = lab_ref.shape
    DM = a2_ref.shape[1]
    B = x1_ref.shape[0]
    D = x1_ref.shape[1]
    M = Mk

    # ---- activation + loss derivative on the carried output (pre-update,
    # exactly the reference's ordering: metrics on f, gradient from f) ----
    f = f_ref[:, :]
    y1h = y_ref[:, :]
    if act_fn == "linear":
        f_act = f
    elif act_fn == "sigmoid":
        f_act = 1.0 / (1.0 + jnp.exp(-f / T))
    else:  # softmax with temperature over the label axis
        z = f / T
        z = z - jnp.max(z, axis=0, keepdims=True)
        e = jnp.exp(z)
        f_act = e / jnp.sum(e, axis=0, keepdims=True)
    if loss_fn == "MSE":
        loss_der = y1h - f_act
    elif loss_fn == "cross_entropy":
        if act_fn == "softmax":  # simplified softmax+CE shortcut
            loss_der = (y1h - y1h * f_act) / T
        else:
            loss_der = y1h / f_act
    else:  # full_cross_ent with the reference's 1e-4 epsilon
        loss_der = 1.0 / (f_act - (1.0 - y1h) + 1e-4)

    # ---- batch metrics (unique-max argmax equivalence) ----
    fmax = jnp.max(f_act, axis=0, keepdims=True)
    hit = jnp.sum((f_act >= fmax).astype(jnp.float32) * y1h, axis=0)
    acc = jnp.mean((hit > 0).astype(jnp.float32))
    mae = jnp.mean(jnp.abs(y1h - f_act))

    # ---- environment expansions (matmul-only, no reshapes) ----
    e_a = _expander(M, I, "repeat")
    e_i = _expander(D, I, "tile")
    e_j = _expander(D, DM, "repeat")
    e_c = _expander(M, DM, "tile")
    left_part = _dot(le_ref[:, :], e_a, _DN, _PREC_DEFAULT) * _dot(
        x1_ref[:, :], e_i, _DN, _PREC_DEFAULT
    )  # (B, I)
    right_part = _dot(x2_ref[:, :], e_j, _DN, _PREC_DEFAULT) * _dot(
        re_ref[:, :], e_c, _DN, _PREC_DEFAULT
    )  # (B, DM)
    lp_ref[:, :] = left_part

    # ---- pass 1: merge + gradient blocks, clip sums ----
    wd = wd_ref[0]
    s_b = jnp.float32(0.0)
    s_db = jnp.float32(0.0)
    for o in range(L):
        bt = _dot(lab_ref[o], a2_ref[:, :], _DN, _PREC_DEFAULT)  # (I, DM)
        w_o = right_part * loss_der[o][:, None]  # (B, DM)
        db = _dot(left_part, w_o, _DN_T, _PREC_DEFAULT)  # (I, DM)
        db = db - wd * bt  # plain weight decay (L2_flag=False family)
        bt_scr[o] = bt
        db_scr[o] = db
        s_b += jnp.sum(jnp.abs(bt))
        s_db += jnp.sum(jnp.abs(db))

    # L1 clip (Network_class.py:753-757) + ascent step
    eta = lr_ref[0] * jnp.where(s_db > s_b, s_b / jnp.maximum(s_db, 1e-30),
                                1.0)

    # ---- pass 2: update + sketch/Gram/f-recompute accumulation ----
    # sketch against the SAME omega the XLA split uses (om_ref is
    # _rangefinder_omega(J, q) viewed as (L, DM, q) label blocks)
    n2 = jnp.float32(0.0)
    s_new = jnp.float32(0.0)
    g_acc = jnp.zeros((I, I), dtype=jnp.float32) if with_gram else None
    y0_acc = jnp.zeros(y0_ref.shape, dtype=jnp.float32)
    for o in range(L):
        bn = bt_scr[o] + eta * db_scr[o]
        bnew_ref[o] = bn
        n2 += jnp.sum(bn * bn)
        s_new += jnp.sum(jnp.abs(bn))
        if with_gram:  # bn @ bn^T: contract the (j,c) axis
            g_acc += _dot(bn, bn, (((1,), (1,)), ((), ())), _PREC_DEFAULT)
        y0_acc += _dot(bn, om_ref[o], _DN, _PREC_DEFAULT)
        v_o = _dot(left_part, bn, _DN, _PREC_DEFAULT)  # (B, DM)
        fnew_ref[o, :] = jnp.sum(v_o * right_part, axis=1)
    y0_ref[:, :] = y0_acc
    if with_gram:
        g_ref[:, :] = g_acc
    else:
        g_ref[:, :] = jnp.zeros(g_ref.shape, dtype=jnp.float32)

    stats_ref[0, 0] = s_b
    stats_ref[0, 1] = s_db
    stats_ref[0, 2] = n2
    stats_ref[0, 3] = s_new
    stats_ref[0, 4] = acc
    stats_ref[0, 5] = mae
    stats_ref[0, 6] = jnp.mean(jnp.abs(f))
    stats_ref[0, 7] = 0.0


@functools.partial(
    jax.jit,
    static_argnames=("act_fn", "loss_fn", "T", "with_gram", "interpret"),
)
def two_site_presplit_pallas(
    lab: jnp.ndarray,      # (L, I, Mk) f32 -- label core, kernel layout
    a2m: jnp.ndarray,      # (Mk, D*M) f32 -- right site (k, (j, c))
    x1: jnp.ndarray,       # (B, D)
    x2: jnp.ndarray,       # (B, D)
    l_env: jnp.ndarray,    # (B, M) carried left environment
    r_env: jnp.ndarray,    # (B, M) stale right environment
    y1h: jnp.ndarray,      # (L, B) one-hot targets
    f: jnp.ndarray,        # (L, B) carried network output
    om: jnp.ndarray,       # (L, D*M, q) omega in label blocks
    lr, weight_dec,
    act_fn: str = "linear",
    loss_fn: str = "MSE",
    T: float = 0.1,
    with_gram: bool = True,
    interpret: bool = False,
):
    """Returns ``(B_new (L, I, DM), y0 (I, q), g (I, I), f_new (L, B),
    left_part (B, I), stats (1, 8))`` with stats =
    ``[sum|B|, sum|dB|, |B_new|_F^2, sum|B_new|, acc, mae, mean|f|, 0]``.
    ``g`` is zeros when ``with_gram=False`` (large-I gram-free path).
    """
    L, I, Mk = lab.shape
    DM = a2m.shape[1]
    B = x1.shape[0]
    q = om.shape[2]
    f32 = jnp.float32
    lr = jnp.asarray(lr, f32).reshape(1)
    wd = jnp.asarray(weight_dec, f32).reshape(1)

    kernel = functools.partial(
        _presplit_kernel, act_fn=act_fn, loss_fn=loss_fn, T=T,
        with_gram=with_gram,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        in_specs=[vmem()] * 9 + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            vmem(), vmem(), vmem(), vmem(), vmem(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, I, DM), f32),   # B_new blocks
            jax.ShapeDtypeStruct((I, q), f32),       # y0 sketch
            jax.ShapeDtypeStruct((I, I) if with_gram else (8, 128), f32),
            jax.ShapeDtypeStruct((L, B), f32),       # f_new
            jax.ShapeDtypeStruct((B, I), f32),       # left_part
            jax.ShapeDtypeStruct((1, 8), f32),       # stats
        ),
        scratch_shapes=[
            pltpu.VMEM((L, I, DM), f32),
            pltpu.VMEM((L, I, DM), f32),
        ],
        interpret=interpret,
    )(
        lab.astype(f32), a2m.astype(f32), x1.astype(f32), x2.astype(f32),
        l_env.astype(f32), r_env.astype(f32), y1h.astype(f32),
        f.astype(f32), om.astype(f32), lr, wd,
    )
    return out
