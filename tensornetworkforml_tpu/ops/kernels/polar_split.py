"""Fused Pallas TPU kernel: latency-minimal canonical split (polar NS).

Round-3 profiling of the flagship sweep (N=196 M=128 L=10 B=256,
``scripts/profile_sweep_ablation.py``, results/profile_sweep_ablation.json)
attributed the 237 us step as: 39 us everything-but-split + ~200 us split,
of which each XLA Cholesky + triangular-solve pair costs ~30-35 us and
every small XLA op ~2.5 us of fixed latency -- so ANY split composed of
~15 sequential XLA ops is latency-floored near 150 us regardless of
arithmetic. This kernel runs the WHOLE subspace split in ONE Mosaic
program (plus one XLA matmul for R), with every intermediate VMEM-resident:

    y  = B @ Omega;  G = B B^T;  n2 = |B|_F^2     (J-tiled grid, one read
                                                   of B; accumulated in
                                                   VMEM scratch)
    repeat n_power:  y = G @ polar_loose(colnorm(y))
    Q  = polar_tight(colnorm(y))                  (last grid step)
    R  = Q^T B                                     (XLA)

Orthonormalisation is matmul-only Newton-Schulz POLAR iteration applied to
the (I, q) iterate directly -- quintic (Polar-Express/Muon-schedule)
passes for range expansion, cubic passes for quadratic convergence --
with the spectrum prescaled by the row-sum bound of Y^T Y. This is what
the round-2 kernel's ``_ns_orth`` (coupled inverse-sqrt on W,
trace-prescaled: smallest eigenvalue ~delta/q => ~23 linear iterations)
could not afford, and why that kernel fell back to sequential in-kernel
Householder QR and LOST to the XLA cholqr (307 ms vs 46 ms per sweep at
M=128). Polar-on-Y with the quintic schedule converges the live block in
6-10 total passes of 3 tiny matmuls each.

Dead-direction contract (matches ``ops.svd.batched_cholqr_split``):
columns below ``dead_tol`` of the largest column norm are zeroed by the
column normalisation and stay EXACTLY zero through every NS pass (a zero
column of Y is a zero row+column of W, and Y @ poly(W) keeps it zero);
near-dead directions come out contracted, never as junk unit columns.

Replaces, on TPU, the per-step dense SVD of the reference
(``Network_class.py:887``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Quintic NS coefficients (the Muon/Polar-Express schedule): contractive on
# [0, 1.1] with slope 3.4445 at 0 -- each pass multiplies small singular
# values by ~3.4 while keeping the top of the spectrum inside [0.7, 1.3].
_QUINTIC = (3.4445, -4.7750, 2.0315)

_DN = (((1,), (0,)), ((), ()))
_DN_T = (((0,), (0,)), ((), ()))


def _dot(a, b, dn=_DN, prec=jax.lax.Precision.HIGHEST):
    return jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32, precision=prec,
    )


def _colnorm(y, dead_tol):
    """Unit-normalize live columns, zero dead ones (exactly)."""
    n = jnp.sqrt(jnp.sum(y * y, axis=0, keepdims=True))
    n_max = jnp.max(n)
    live = (n > dead_tol * n_max) & jnp.isfinite(n)
    return jnp.where(live, y / jnp.maximum(n, 1e-30), 0.0)


def _polar_ns(y, n_quintic: int, n_cubic: int, n_cubic_hi: int = 0):
    """Matmul-only polar orthonormalisation of ``y (I, q)``.

    Safety: the prescale is the EXACT row-sum bound ||W||_inf >= sigma_max^2
    (PSD W = Y^T Y), so every singular value enters at <= 1 -- and the
    quintic map with the _QUINTIC coefficients is INVARIANT on [0, 1.101]
    (its maximum on that interval is 1.101, at x = 0.554), so no pass can
    ever diverge and no per-pass clamping is needed. Two earlier designs
    failed here: a Rayleigh-estimate prescale is not a guaranteed bound (a
    structured W can leave sigma > 1.4 => quintic overflow => NaN => the
    dead-mask zeroes the model -- observed in training), and per-pass
    row-sum re-clamping keeps firing mid-convergence (off-diagonal mass
    inflates the row sum by ~sqrt(q) while columns are still correlated),
    shrinking the iterate and destroying capture. The row-sum prescale
    overestimates sigma_max by at most sqrt(q) ~ 16x, which costs ~2
    extra quintic passes (3.44x lift per pass) -- the schedules below
    include them.

    Precision: quintic passes and all but the last ``n_cubic_hi`` cubic
    passes run at Precision.HIGH (3-pass bf16, ~2e-4 relative -- below
    the cholqr ridge's documented isometry cost); the final ``n_cubic_hi``
    passes run at HIGHEST to polish. Convergence: live directions enter
    the cubic phase inside [~0.68, 1.101] (the quintic's attracting band)
    and converge quadratically; sub-threshold directions stay CONTRACTED
    -- the same annihilation contract as the cholqr ridge.
    """
    q = y.shape[1]
    eye = jnp.eye(q, dtype=y.dtype)
    hi = jax.lax.Precision.HIGHEST
    # Mosaic rejects Precision.HIGH ("Unsupported dot precision") -- the
    # NS phase runs at HIGHEST too. (DEFAULT/bf16 would put ~8e-3 noise on
    # W, replacing sub-1e-2 directions with junk; measured unusable.)
    md = jax.lax.Precision.HIGHEST
    w = _dot(y, y, _DN_T, md)
    rowsum = jnp.max(jnp.sum(jnp.abs(w), axis=1))  # >= sigma_max^2 (PSD)
    y = y / jnp.sqrt(jnp.maximum(rowsum, 1e-30))
    a, b, c = _QUINTIC
    for _ in range(n_quintic):
        w = _dot(y, y, _DN_T, md)
        p = a * eye + b * w + c * _dot(w, w, _DN, md)
        y = _dot(y, p, _DN, md)
    for _ in range(n_cubic):
        w = _dot(y, y, _DN_T, md)
        y = _dot(y, 1.5 * eye - 0.5 * w, _DN, md)
    for _ in range(n_cubic_hi):
        w = _dot(y, y, _DN_T, hi)
        y = _dot(y, 1.5 * eye - 0.5 * w, _DN, hi)
    return y



def _tile_j(I: int, J: int, max_bytes: int = 2 ** 19):
    """J-tiling for the (I, tj) input blocks: chunk width is a multiple
    of 128 (Mosaic lane constraint), <= 2048 columns, AND capped so one
    block stays <= ``max_bytes`` (default 2 MB). The byte cap is
    load-bearing: Mosaic's remote compiler crashes (tpu_compile_helper
    exit 1) for blocks >= ~3 MB -- bisected on hardware round 3:
    (384, 2048) f32 crashes while (384, 1024), (512, 1024), and
    (320, 2048) compile. This was previously misattributed to the ROW
    count (the old 'I >= 384' limitation); with the cap every I up to
    >= 1024 compiles. The gram-free kernels pass 2 ** 18 (1 MB): at
    I >= 1024 the double-buffered input blocks share the 16 MB VMEM
    stack with the (I, q) accumulators. Returns ``(nc, tj, pad)`` with
    ``nc * tj = J + pad``.
    """
    tj_cap = min(2048, max(128, 128 * ((max_bytes // 4 // max(I, 1)) // 128)))
    nc = max(1, -(-J // tj_cap))
    tj = 128 * (-(-J // (nc * 128)))
    pad = nc * tj - J
    return nc, tj, pad


def _polar_split_kernel(
    b_ref, om_ref, q_ref, y_acc, g_acc, n2_acc, *,
    n_power: int, loop_quintic: int, loop_cubic: int, final_quintic: int,
    final_cubic: int, dead_tol: float,
):
    i = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        y_acc[:, :] = jnp.zeros_like(y_acc)
        g_acc[:, :] = jnp.zeros_like(g_acc)
        n2_acc[0, 0] = 0.0

    b = b_ref[:, :].astype(jnp.float32)
    y_acc[:, :] += _dot(b, om_ref[:, :].astype(jnp.float32))
    g_acc[:, :] += _dot(b, b, (((1,), (1,)), ((), ())))
    n2_acc[0, 0] += jnp.sum(b * b)

    @pl.when(i == nc - 1)
    def _iterate():
        bn2 = jnp.maximum(n2_acc[0, 0], 1e-30)
        g = g_acc[:, :] / bn2  # spectrum of (B/|B|) (B/|B|)^T: <= 1
        y = y_acc[:, :]
        for _ in range(n_power):
            y = _colnorm(y, dead_tol)
            y = _polar_ns(y, loop_quintic, loop_cubic)
            y = _dot(g, y)
        y = _colnorm(y, dead_tol)
        q = _polar_ns(y, final_quintic, final_cubic, n_cubic_hi=3)
        q_ref[:, :] = q.astype(q_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rank", "n_power", "loop_quintic", "loop_cubic", "final_quintic",
        "final_cubic", "interpret",
    ),
)
def polar_split_pallas(
    bmat: jnp.ndarray,
    rank: int,
    n_power: int = 1,
    loop_quintic: int = 7,
    loop_cubic: int = 1,
    final_quintic: int = 9,
    final_cubic: int = 9,
    interpret: bool = False,
):
    """Canonical split ``bmat (I, J) -> (Q (I, rank) isometric, R = Q^T B)``
    via the fused polar-NS kernel. Same contract as
    ``ops.svd.batched_cholqr_split`` (canonical gauge, dead slots
    contracted); J is tiled through VMEM so any bond dimension fits.
    """
    from tensornetworkforml_tpu.ops.svd import _rangefinder_omega

    I, J = bmat.shape
    q_cols = min(rank, I)
    out_dtype = bmat.dtype
    dead_tol = 1e-6 if bmat.dtype != jnp.float64 else 1e-12
    if bmat.dtype not in (jnp.float32,):
        bmat = bmat.astype(jnp.float32)

    # J-tiling: see _tile_j -- <= 2048-column chunks keep the
    # double-buffered input blocks + scratch inside the ~16 MB VMEM at any
    # bond dimension (a 4096 chunk at M=256 overflowed VMEM), and the 2 MB
    # per-block byte cap avoids the Mosaic remote-compiler crash at large
    # I x tj; pad J up with zero columns.
    nc, tj, pad = _tile_j(I, J)
    if pad:
        bmat = jnp.concatenate(
            [bmat, jnp.zeros((I, pad), dtype=bmat.dtype)], axis=1
        )
    om = _rangefinder_omega(J + pad, q_cols, bmat.dtype)

    q = pl.pallas_call(
        functools.partial(
            _polar_split_kernel,
            n_power=n_power, loop_quintic=loop_quintic,
            loop_cubic=loop_cubic, final_quintic=final_quintic,
            final_cubic=final_cubic, dead_tol=dead_tol,
        ),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((I, tj), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, q_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((I, q_cols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((I, q_cols), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((I, q_cols), jnp.float32),
            pltpu.VMEM((I, I), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(bmat, om)

    if q_cols < rank:  # ragged: pad dead slots (I < rank never happens
        q = jnp.concatenate(  # for the two-site tensor, I = 2M >= M=rank)
            [q, jnp.zeros((I, rank - q_cols), dtype=q.dtype)], axis=1
        )
    with jax.default_matmul_precision("float32"):
        r = q.T @ bmat[:, : J] if pad else q.T @ bmat
    return q.astype(out_dtype), r.astype(out_dtype)


# ---------------------------------------------------------------------------
# GRAM-FREE form for LARGE I (round-4, VERDICT-r3 #5): at I = 1024
# (M = 512) the (I, I) Gram block is 4 MB -- over the ~3 MB Mosaic block
# limit that crashes the remote compiler -- so both the fused kernel and
# the two-stage form above are unavailable exactly where splits cost the
# most. The identity ``G @ y = B @ (B^T @ y)`` removes the Gram entirely:
#
#   kernel A (J-tiled):  y0 = B @ Omega, n2 = |B|_F^2; last step:
#                        y1 = polar_ns(colnorm(y0))          (loop phase)
#   kernel B (J-tiled):  z = sum_j B_j @ (B_j^T @ y1) = (B B^T) y1;
#                        last step: Q = polar_ns(colnorm(z)) (final phase)
#   R = Q^T B (XLA)
#
# Identical math to the fused kernel at n_power = 1 (the shipped
# schedule); same total MXU FLOPs (the per-chunk pair B_j^T y1 / B_j t is
# exactly the Gram's FLOPs re-associated); every VMEM block is
# <= max(2 MB J-tiles, I*q floats) -- no (I, I) array anywhere, so the
# split scales to any bond dimension the (I, q) iterate itself fits.
# ---------------------------------------------------------------------------


def _sketch_kernel(b_ref, om_ref, y_ref, n2_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        y_ref[:, :] = jnp.zeros_like(y_ref)
        n2_ref[0, 0] = 0.0

    b = b_ref[:, :].astype(jnp.float32)
    y_ref[:, :] += _dot(b, om_ref[:, :].astype(jnp.float32))
    n2_ref[0, 0] += jnp.sum(b * b)


def _gmul_kernel(b_ref, y1_ref, z_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        z_ref[:, :] = jnp.zeros_like(z_ref)

    b = b_ref[:, :].astype(jnp.float32)
    t = _dot(b, y1_ref[:, :], _DN_T)  # (tj, q) = B_j^T y1
    z_ref[:, :] += _dot(b, t)  # (I, q): G y1 accumulated chunk-wise


@functools.partial(jax.jit, static_argnames=("rank", "interpret"))
def gramfree_split(
    bmat: jnp.ndarray,
    rank: int,
    interpret: bool = False,
):
    """LARGE-BOND canonical split (``ops/svd.py`` dispatches it for
    I > 512 on TPU, lifting the round-3 XLA-cholqr fallback): one-power-
    iteration rangefinder with cholqr orthonormalisation, the two
    J-carrying reductions as J-tiled Pallas kernels, and NO (I, I) Gram
    anywhere -- ``G @ y`` is applied as ``B (B^T y)`` (same FLOPs
    re-associated), so nothing exceeds Mosaic's ~3 MB block / 16 MB VMEM
    stack limits at any bond dimension.

    The orthonormalisations run as XLA cholqr (``ops.svd._cholqr_subspace``
    with ``n_power=0`` -- the exact double-cholqr pass, so the dead-
    direction contract is the cholqr ridge's). An in-kernel Newton-Schulz
    orth was built first and measured into Mosaic's VMEM-stack wall at
    I=1024, q=512: the stack allocator does not reuse buffers across an
    unrolled pass chain (21-31 MB for every unrolled variant; a W-space
    form with (q, q) temporaries and a fori_loop form still OOM at
    24-27 MB). At this size the handful of XLA ops cost ~2% of the
    split's matmul time -- the latency argument that motivates the fused
    kernels at I <= 384 does not bind here.

    Capture contract: same subspace as ``polar_split_pallas`` (the BASIS
    differs -- orth method is gauge, and canonical-mode training is
    invariant to it).
    """
    from tensornetworkforml_tpu.ops.svd import (
        _cholqr_eps,
        _cholqr_subspace,
        _rangefinder_omega,
    )

    I, J = bmat.shape
    q_cols = min(rank, I)
    out_dtype = bmat.dtype
    if bmat.dtype not in (jnp.float32,):
        bmat = bmat.astype(jnp.float32)
    eps = _cholqr_eps(bmat.dtype, q_cols)

    def orth(y):
        # colnorm + double cholqr at the safe ridge (g unused at
        # n_power=0), then ONE polish pass at a tiny ridge: after the
        # ridged passes W = Q^T Q = I + O(eps) is superbly conditioned,
        # and the polish removes the ridge's isometry bias (2.4e-4 ->
        # ~1e-6 measured), which otherwise costs ~1e-4 of captured
        # energy per split. Dead columns stay exactly zero through the
        # triangular solve (their W diagonal is just the tiny ridge).
        q = _cholqr_subspace(None, y[None], eps, 0)[0]
        w = _dot(q, q, _DN_T)
        # W = I + O(eps) here, so Cholesky is stable at a FLOOR ridge --
        # 1e-6 only keeps exactly-dead columns (diag 0) factorable; a
        # q-scaled ridge would reinstate the bias this pass removes
        tiny = 1e-6 if w.dtype == jnp.float32 else 1e-14
        c = jnp.linalg.cholesky(
            w + tiny * jnp.eye(q_cols, dtype=w.dtype)
        )
        return jax.lax.linalg.triangular_solve(
            c, q, left_side=False, lower=True, transpose_a=True
        )

    nc, tj, pad = _tile_j(I, J, max_bytes=2 ** 18)
    if pad:
        bmat = jnp.concatenate(
            [bmat, jnp.zeros((I, pad), dtype=bmat.dtype)], axis=1
        )
    om = _rangefinder_omega(J + pad, q_cols, bmat.dtype)

    # sketch kernel -> XLA orth -> G-multiply kernel -> XLA orth. The
    # J-carrying kernels do pure accumulation (VMEM stack ~6 MB at
    # I=1024, q=512); see the docstring for why the orths are XLA.
    y0, n2 = pl.pallas_call(
        _sketch_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((I, tj), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, q_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((I, q_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((I, q_cols), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(bmat, om)

    with jax.default_matmul_precision("float32"):
        y1 = orth(y0 / jnp.sqrt(jnp.maximum(n2[0, 0], 1e-30)))

    z = pl.pallas_call(
        _gmul_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((I, tj), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((I, q_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((I, q_cols), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((I, q_cols), jnp.float32),
        interpret=interpret,
    )(bmat, y1)

    with jax.default_matmul_precision("float32"):
        # n2 division: overflow safety only (colnorm absorbs any scale)
        q = orth(z / jnp.maximum(n2[0, 0], 1e-30))

    if q_cols < rank:
        q = jnp.concatenate(
            [q, jnp.zeros((I, rank - q_cols), dtype=q.dtype)], axis=1
        )
    with jax.default_matmul_precision("float32"):
        r = q.T @ bmat[:, :J] if pad else q.T @ bmat
    return q.astype(out_dtype), r.astype(out_dtype)


# ---------------------------------------------------------------------------
# Two-stage form, used two ways: (a) GSPMD composition
# (parallel/dist_split.py): stage 1 accumulates the J-carrying reductions
# per shard (one Pallas kernel each), a psum merges them across the mesh,
# stage 2 runs the replicated subspace iteration (second Pallas kernel);
# (b) LARGE single-device splits (polar_split_two_stage below): the fused
# kernel's Mosaic compile crashes for I > 384 (the unrolled NS-iteration
# phase inside the same program -- the standalone stages compile and run
# at I = 512 where the fused kernel does not; bisected on hardware round
# 3). Same math as the fused kernel above.
# ---------------------------------------------------------------------------


def _sketch_gram_kernel(b_ref, om_ref, y_ref, g_ref, n2_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        y_ref[:, :] = jnp.zeros_like(y_ref)
        g_ref[:, :] = jnp.zeros_like(g_ref)
        n2_ref[0, 0] = 0.0

    b = b_ref[:, :].astype(jnp.float32)
    y_ref[:, :] += _dot(b, om_ref[:, :].astype(jnp.float32))
    g_ref[:, :] += _dot(b, b, (((1,), (1,)), ((), ())))
    n2_ref[0, 0] += jnp.sum(b * b)


def _iterate_kernel(y_ref, g_ref, n2_ref, q_ref, *, n_power, loop_quintic,
                    loop_cubic, final_quintic, final_cubic, dead_tol):
    bn2 = jnp.maximum(n2_ref[0, 0], 1e-30)
    g = g_ref[:, :] / bn2
    y = y_ref[:, :]
    for _ in range(n_power):
        y = _colnorm(y, dead_tol)
        y = _polar_ns(y, loop_quintic, loop_cubic)
        y = _dot(g, y)
    y = _colnorm(y, dead_tol)
    q = _polar_ns(y, final_quintic, final_cubic, n_cubic_hi=3)
    q_ref[:, :] = q.astype(q_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def polar_sketch_gram_pallas(bmat, om, interpret: bool = False):
    """Stage 1: ``(Y = B Omega, G = B B^T, n2 = |B|_F^2)`` for a (local
    column shard of) ``B (I, J)``, J-tiled through VMEM. ``om`` must hold
    the omega ROWS matching B's columns."""
    I, J = bmat.shape
    q_cols = om.shape[1]
    nc, tj, pad = _tile_j(I, J)
    if pad:
        z = jnp.zeros((I, pad), dtype=bmat.dtype)
        bmat = jnp.concatenate([bmat, z], axis=1)
        om = jnp.concatenate(
            [om, jnp.zeros((pad, q_cols), dtype=om.dtype)], axis=0
        )
    y, g, n2 = pl.pallas_call(
        _sketch_gram_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((I, tj), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, q_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((I, q_cols), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((I, q_cols), jnp.float32),
            jax.ShapeDtypeStruct((I, I), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        interpret=interpret,
    )(bmat, om)
    return y, g, n2


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_power", "loop_quintic", "loop_cubic", "final_quintic",
        "final_cubic", "dead_tol", "interpret",
    ),
)
def polar_iterate_pallas(
    y, g, n2,
    n_power: int = 1,
    loop_quintic: int = 7,
    loop_cubic: int = 1,
    final_quintic: int = 9,
    final_cubic: int = 9,
    dead_tol: float = 1e-6,
    interpret: bool = False,
):
    """Stage 2: the replicated subspace iteration -> isometric ``Q``."""
    I, q_cols = y.shape
    return pl.pallas_call(
        functools.partial(
            _iterate_kernel,
            n_power=n_power, loop_quintic=loop_quintic,
            loop_cubic=loop_cubic, final_quintic=final_quintic,
            final_cubic=final_cubic, dead_tol=dead_tol,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((I, q_cols), jnp.float32),
        interpret=interpret,
    )(y, g, n2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rank", "n_power", "loop_quintic", "loop_cubic", "final_quintic",
        "final_cubic", "interpret",
    ),
)
def polar_split_two_stage(
    bmat: jnp.ndarray,
    rank: int,
    n_power: int = 1,
    loop_quintic: int = 7,
    loop_cubic: int = 1,
    final_quintic: int = 9,
    final_cubic: int = 9,
    interpret: bool = False,
):
    """Same contract as ``polar_split_pallas`` but as TWO Mosaic programs
    (sketch/Gram, then the subspace iteration). One extra kernel dispatch
    per split, but it compiles at I = 512 (M = 256) where the fused
    kernel's NS-unroll phase crashes Mosaic; the I <= 384 flagship shapes
    keep the fused single-program path (``ops/svd.py`` dispatches).
    NOTE n_power is fixed at 1 here (the stage-2 kernel's contract).
    """
    from tensornetworkforml_tpu.ops.svd import _rangefinder_omega

    I, J = bmat.shape
    q_cols = min(rank, I)
    out_dtype = bmat.dtype
    dead_tol = 1e-6 if bmat.dtype != jnp.float64 else 1e-12
    if bmat.dtype not in (jnp.float32,):
        bmat = bmat.astype(jnp.float32)
    om = _rangefinder_omega(J, q_cols, bmat.dtype)
    y, g, n2 = polar_sketch_gram_pallas(bmat, om, interpret=interpret)
    q = polar_iterate_pallas(  # the iterate kernel divides g by n2 itself
        y, g, n2,
        n_power=n_power, loop_quintic=loop_quintic, loop_cubic=loop_cubic,
        final_quintic=final_quintic, final_cubic=final_cubic,
        dead_tol=dead_tol, interpret=interpret,
    )
    if q_cols < rank:
        q = jnp.concatenate(
            [q, jnp.zeros((I, rank - q_cols), dtype=q.dtype)], axis=1
        )
    with jax.default_matmul_precision("float32"):
        r = q.T @ bmat
    return q.astype(out_dtype), r.astype(out_dtype)
