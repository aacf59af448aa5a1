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

Orthonormalisation is matmul-only Newton-Schulz POLAR iteration applied
to the (I, q) iterate directly, with PER-PASS OPTIMAL odd-quintic
coefficients (the greedy Polar Express construction, solved host-side in
``_pe_schedule``) and the spectrum prescaled by the row-sum bound of
Y^T Y. This is what the round-2 kernel's ``_ns_orth`` (coupled
inverse-sqrt on W, trace-prescaled: smallest eigenvalue ~delta/q => ~23
linear iterations) could not afford, and why that kernel fell back to
sequential in-kernel Householder QR and LOST to the XLA cholqr (307 ms
vs 46 ms per sweep at M=128). The greedy schedule converges the whole
3-decade validity domain in 5 + 10 passes of 3 tiny matmuls each --
round 3 shipped fixed coefficients needing 8 + 21 passes for the same
contract (~45% of the kernel's pass count removed at equal capture)-- and
per-pass time is what dominates this latency-class kernel.

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


def _minimax_quintic(lo: float, hi: float):
    """Coefficients of the odd quintic f(x) = a x + b x^3 + c x^5
    minimizing ``max_{x in [lo, hi]} |f(x) - 1|`` (host-side; Lawson's
    iteratively reweighted least squares on a dense grid -- converges to
    the Chebyshev solution and is robust where a naive Remez exchange is
    finicky). Returns ``(a, b, c, E)``."""
    import numpy as _np

    x = _np.linspace(lo, hi, 4001)
    A = _np.stack([x, x ** 3, x ** 5], axis=1)
    w = _np.ones_like(x)
    coef = _np.zeros(3)
    for _ in range(400):
        sw = _np.sqrt(w / w.sum())
        coef, *_ = _np.linalg.lstsq(A * sw[:, None], sw, rcond=None)
        err = _np.abs(A @ coef - 1.0)
        w = w * (err + 1e-30)
        w = w / w.max()
    E = float(_np.abs(A @ coef - 1.0).max())
    return float(coef[0]), float(coef[1]), float(coef[2]), E


@functools.lru_cache(maxsize=None)
def _pe_schedule(l0: float, e_target: float, max_passes: int = 24):
    """Greedy per-pass optimal Newton-Schulz schedule (the Polar Express
    construction, Amsel-Persson-Musco-Gower 2025): pass k applies the
    minimax odd quintic on the CURRENT singular-value interval
    [lo_k, hi_k], which the pass maps to [1 - E_k, 1 + E_k]; greedy
    per-pass minimax is optimal for the composition. Converges any
    x >= l0 to |x - 1| <= e_target in the returned number of passes --
    ~2x fewer than the fixed-coefficient quintic/cubic schedule for the
    same interval (measured: 16 vs 29 passes at l0 = 3e-5), which is pure
    per-pass kernel-time savings since every singular value enters the
    quintic-safe range by construction (f's range on [lo, hi] is exactly
    [1 - E, 1 + E]; no invariant-region argument needed).

    Host-side and cached; the schedule is a static tuple baked into the
    kernel at trace time. ``l0`` sets the deepest live direction that
    converges: below it, directions come out CONTRACTED (the cholqr
    annihilation contract), so l0 must cover the documented ~3-decade
    kept-spectrum validity domain DIVIDED by the row-sum prescale's
    sqrt(q) overestimate (1e-3 / 16 ~= 6e-5 at q = 128; the defaults use
    3e-5 for margin)."""
    coeffs = []
    lo, hi = float(l0), 1.0
    for _ in range(max_passes):
        a, b, c, E = _minimax_quintic(lo, hi)
        coeffs.append((a, b, c))
        lo, hi = 1.0 - E, 1.0 + E
        if E <= e_target:
            break
    return tuple(coeffs)


# Default greedy schedules for the split kernels. Loop phase (before the
# Gram multiply) only CONDITIONS the iterate for the f32 power iteration,
# so it stops at E ~ 0.25 from l0 = 1e-3 (the raw sketch's conditioning).
# The final phase runs on the G-MULTIPLIED iterate, whose spectrum is the
# SQUARE of the two-site spectrum (3 kept decades -> 6), further /16 by
# the row-sum prescale: l0 = 1e-7 covers it (l0 = 3e-5 measured iso
# 4.5e-2 on the gapped quality gates -- the deep directions entered below
# the solved interval and never converged).
_PE_LOOP = (1e-3, 0.25)
_PE_FINAL = (1e-7, 1e-7)


def _polar_ns_greedy(y, coeffs, md=jax.lax.Precision.HIGHEST):
    """Matmul-only polar orthonormalisation of ``y (I, q)`` with a
    per-pass coefficient schedule from ``_pe_schedule``.

    Safety: the prescale is the EXACT row-sum bound
    ||W||_inf >= sigma_max^2 (PSD W = Y^T Y), so every singular value
    enters pass 1 inside the solved interval [l0, 1]; each pass maps its
    interval to [1-E, 1+E], which is exactly the next pass's solved
    domain -- no invariant-region or clamping argument needed. (A
    Rayleigh-estimate prescale is NOT a guaranteed bound: a structured W
    can enter above the solved interval => overflow => NaN => the
    dead-mask zeroes the model -- observed in round-2 training.) The
    row-sum bound overestimates sigma_max by at most sqrt(q) ~ 16x,
    which l0 must absorb (see ``_pe_schedule``).

    Precision: Mosaic rejects Precision.HIGH, and DEFAULT/bf16 puts
    ~8e-3 noise on W (replaces sub-1e-2 directions with junk; measured
    unusable round 3) -- every dot runs at HIGHEST. Sub-l0 directions
    come out CONTRACTED, never junk unit columns (the cholqr
    annihilation contract): the dead-tol colnorm zeroes exact-dead
    columns first, and the schedule's total slope product lifts 1e-6
    noise only to ~0.2.
    """
    eye = jnp.eye(y.shape[1], dtype=y.dtype)
    w = _dot(y, y, _DN_T, md)
    rowsum = jnp.max(jnp.sum(jnp.abs(w), axis=1))  # >= sigma_max^2 (PSD)
    y = y / jnp.sqrt(jnp.maximum(rowsum, 1e-30))
    for a, b, c in coeffs:
        w = _dot(y, y, _DN_T, md)
        p = a * eye + b * w + c * _dot(w, w, _DN, md)
        y = _dot(y, p, _DN, md)
    return y


def _tile_j(I: int, J: int, max_bytes: int = 2 ** 21):
    """J-tiling for the (I, tj) input blocks: chunk width is a multiple
    of 128 (Mosaic lane constraint), <= 2048 columns, AND capped so one
    f32 block stays <= ``max_bytes`` BYTES (default 2 ** 21 = 2 MB; the
    ``// 4`` below converts bytes -> f32 elements). The byte cap is
    load-bearing: Mosaic's remote compiler crashes (tpu_compile_helper
    exit 1) for blocks >= ~3 MB -- bisected on hardware round 3:
    (384, 2048) f32 crashes (3 MB) while (384, 1024), (512, 1024), and
    (320, 2048) compile (<= 2.5 MB). This was previously misattributed
    to the ROW count (the old 'I >= 384' limitation); with the cap
    every I up to >= 1024 compiles. The gram-free kernels pass 2 ** 20
    (1 MB): at I >= 1024 the double-buffered input blocks share the
    16 MB VMEM stack with the (I, q) accumulators. Returns
    ``(nc, tj, pad)`` with ``nc * tj = J + pad``.
    """
    tj_cap = min(2048, max(128, 128 * ((max_bytes // 4 // max(I, 1)) // 128)))
    nc = max(1, -(-J // tj_cap))
    tj = 128 * (-(-J // (nc * 128)))
    pad = nc * tj - J
    return nc, tj, pad


def _polar_split_kernel(
    b_ref, om_ref, q_ref, y_acc, g_acc, n2_acc, *,
    n_power: int, loop_coeffs: tuple, final_coeffs: tuple, dead_tol: float,
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
            y = _polar_ns_greedy(y, loop_coeffs)
            y = _dot(g, y)
        y = _colnorm(y, dead_tol)
        q = _polar_ns_greedy(y, final_coeffs)
        q_ref[:, :] = q.astype(q_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rank", "n_power", "loop_coeffs", "final_coeffs", "interpret",
    ),
)
def polar_split_pallas(
    bmat: jnp.ndarray,
    rank: int,
    n_power: int = 1,
    loop_coeffs: tuple = None,
    final_coeffs: tuple = None,
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
    if loop_coeffs is None:
        loop_coeffs = _pe_schedule(*_PE_LOOP)
    if final_coeffs is None:
        final_coeffs = _pe_schedule(*_PE_FINAL)

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
            n_power=n_power, loop_coeffs=loop_coeffs,
            final_coeffs=final_coeffs, dead_tol=dead_tol,
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


def _sketch_kernel(b_ref, om_ref, y_ref, n2_ref, *, prec):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        y_ref[:, :] = jnp.zeros_like(y_ref)
        n2_ref[0, 0] = 0.0

    b = b_ref[:, :].astype(jnp.float32)
    y_ref[:, :] += _dot(b, om_ref[:, :].astype(jnp.float32), prec=prec)
    n2_ref[0, 0] += jnp.sum(b * b)


def _gmul_kernel(b_ref, y1_ref, z_ref, *, prec):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        z_ref[:, :] = jnp.zeros_like(z_ref)

    b = b_ref[:, :].astype(jnp.float32)
    t = _dot(b, y1_ref[:, :], _DN_T, prec)  # (tj, q) = B_j^T y1
    z_ref[:, :] += _dot(b, t, prec=prec)  # (I, q): G y1, chunk-wise


@functools.partial(
    jax.jit,
    static_argnames=("rank", "interpret", "precision", "orth", "ns_prec"),
)
def gramfree_split(
    bmat: jnp.ndarray,
    rank: int,
    interpret: bool = False,
    precision: str = "default",
    orth: str = "ns",
    ns_prec: str = "highest",
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

    ``precision`` ("default" | "highest") sets the MXU precision of the
    J-carrying kernel matmuls AND of ``R = Q^T B``: "default" runs them
    as single bf16 passes with f32 accumulation -- 6x the matmul
    throughput of the round-4 hardcoded HIGHEST, and measured capture-
    equivalent on the gapped two-site gate (the hybrid split's XLA
    sketch/Gram/R already ran at the sweep's default precision with
    quality parity; results/m512_profile.json). The small (I, q)/(q, q)
    orthonormalisation work always stays full f32.

    ``orth`` selects the orthonormalisation engine:
      * ``"ns"`` (default) -- the greedy Polar-Express Newton-Schulz
        orthonormalisation (``_polar_ns_greedy``: exact row-sum-bound
        prescale, per-pass minimax quintics, dead-tol colnorm), run AS
        XLA ops at HIGHEST precision. This is the SAME numerics the
        Mosaic iterate kernel uses at I <= 768; at I = 1024, q = 512 the
        in-kernel form hits Mosaic's VMEM-stack wall (round-4 finding:
        21-31 MB, no buffer reuse across the unrolled pass chain) but
        XLA has no such limit -- and each XLA Cholesky+solve pair costs
        ~854 us at this shape (measured, results/m512_profile.json)
        vs ~40 us of matmul work per NS pass, so the round-4 cholqr
        chain (6 pairs, ~2.2 ms) was the split's dominant cost.
        The conditioner phase runs the loop schedule, the final phase
        the full schedule; pass counts match the iterate kernel's.
      * ``"cholqr"`` -- the round-4 behavior: colnorm + CholQR2 with the
        q-scaled ridge + tiny-ridge polish for BOTH orths (the full
        structure is load-bearing: every lighter Cholesky chain measured
        iso >= 1e-1 on the 3-decade worst-case spectrum).
    Both engines zero dead columns exactly and contract sub-resolution
    directions (the cholqr annihilation contract).
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
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    dead_tol = 1e-6
    ee = jnp.eye(q_cols, dtype=jnp.float32)

    def _polish(q):
        # W = I + O(eps) here, so Cholesky is stable at a FLOOR ridge --
        # 1e-6 only keeps exactly-dead columns (diag 0) factorable; a
        # q-scaled ridge would reinstate the isometry bias (2.4e-4 ->
        # ~1e-6 measured) this pass removes.
        w = _dot(q, q, _DN_T)
        c = jnp.linalg.cholesky(w + 1e-6 * ee)
        return jax.lax.linalg.triangular_solve(
            c, q, left_side=False, lower=True, transpose_a=True
        )

    if orth == "ns":
        # one extra tail pass on the final schedule: at q = 512 the
        # row-sum prescale overestimates sigma_max by up to sqrt(q) ~ 23
        # (vs the ~16 the 1e-7 default was budgeted for at q <= 256), so
        # the deepest kept directions of the SQUARED spectrum start near
        # 4e-8 -- the l0 = 1e-8 schedule covers them
        final_sched = _pe_schedule(1e-8, 1e-7)
        loop_sched = _pe_schedule(*_PE_LOOP)
        # ns_prec: MXU precision of the NS passes themselves. These run
        # as XLA ops (unlike the Mosaic iterate kernel, which rejects
        # HIGH), so the 3-pass "high" mode is available as a measured
        # speed/accuracy trade; "highest" (6-pass) is the proven default.
        md = (
            jax.lax.Precision.HIGHEST
            if ns_prec == "highest"
            else jax.lax.Precision.HIGH
        )

        def orth_first(y):  # conditioner for the power iteration
            return _polar_ns_greedy(_colnorm(y, dead_tol), loop_sched, md)

        def orth_final(z):
            return _polar_ns_greedy(_colnorm(z, dead_tol), final_sched, md)

    elif orth == "cholqr":

        def orth_first(y):  # round-4 behavior: CholQR2 + polish
            return _polish(_cholqr_subspace(None, y[None], eps, 0)[0])

        orth_final = orth_first
    else:
        raise ValueError(f"unknown orth {orth!r}")

    nc, tj, pad = _tile_j(I, J, max_bytes=2 ** 20)
    if pad:
        bmat = jnp.concatenate(
            [bmat, jnp.zeros((I, pad), dtype=bmat.dtype)], axis=1
        )
    om = _rangefinder_omega(J + pad, q_cols, bmat.dtype)

    # sketch kernel -> XLA orth -> G-multiply kernel -> XLA orth. The
    # J-carrying kernels do pure accumulation (VMEM stack ~6 MB at
    # I=1024, q=512); see the docstring for why the orths are XLA.
    y0, n2 = pl.pallas_call(
        functools.partial(_sketch_kernel, prec=prec),
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
        y1 = orth_first(y0 / jnp.sqrt(jnp.maximum(n2[0, 0], 1e-30)))

    z = pl.pallas_call(
        functools.partial(_gmul_kernel, prec=prec),
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
        q = orth_final(z / jnp.maximum(n2[0, 0], 1e-30))

    if q_cols < rank:
        q = jnp.concatenate(
            [q, jnp.zeros((I, rank - q_cols), dtype=q.dtype)], axis=1
        )
    bm = bmat[:, :J] if pad else bmat
    r = jax.lax.dot_general(
        q, bm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
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


def _iterate_kernel(y_ref, g_ref, n2_ref, q_ref, *, n_power, loop_coeffs,
                    final_coeffs, dead_tol, n2_from_trace=False):
    if n2_from_trace:
        # n2 = |B|_F^2 = tr(B B^T) = tr(G): reading it off the Gram block
        # saves the caller two XLA ops (reduction + reshape) per split
        I = g_ref.shape[0]
        ri = jax.lax.broadcasted_iota(jnp.int32, (I, I), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (I, I), 1)
        bn2 = jnp.sum(jnp.where(ri == ci, g_ref[:, :], 0.0))
    else:
        bn2 = n2_ref[0, 0]
    bn2 = jnp.maximum(bn2, 1e-30)
    g = g_ref[:, :] / bn2
    y = y_ref[:, :]
    for _ in range(n_power):
        y = _colnorm(y, dead_tol)
        y = _polar_ns_greedy(y, loop_coeffs)
        y = _dot(g, y)
    y = _colnorm(y, dead_tol)
    q = _polar_ns_greedy(y, final_coeffs)
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
        "n_power", "loop_coeffs", "final_coeffs", "dead_tol", "interpret",
    ),
)
def polar_iterate_pallas(
    y, g, n2=None,
    n_power: int = 1,
    loop_coeffs: tuple = None,
    final_coeffs: tuple = None,
    dead_tol: float = 1e-6,
    interpret: bool = False,
):
    """Stage 2: the replicated subspace iteration -> isometric ``Q``.

    ``n2`` is ``|B|_F^2`` as a (1, 1) array; pass ``None`` to have the
    kernel read it off ``tr(G)`` (valid whenever ``g`` is the UNSCALED
    Gram ``B B^T``, as in ``hybrid_polar_split`` -- the sharded callers
    in ``parallel/dist_split.py`` pass an explicitly psum'd n2 instead
    because their local ``g`` shard is partial)."""
    I, q_cols = y.shape
    if loop_coeffs is None:
        loop_coeffs = _pe_schedule(*_PE_LOOP)
    if final_coeffs is None:
        final_coeffs = _pe_schedule(*_PE_FINAL)
    n2_from_trace = n2 is None
    if n2_from_trace:
        n2 = jnp.zeros((1, 1), dtype=jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _iterate_kernel,
            n_power=n_power, loop_coeffs=loop_coeffs,
            final_coeffs=final_coeffs, dead_tol=dead_tol,
            n2_from_trace=n2_from_trace,
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


@functools.partial(jax.jit, static_argnames=("rank", "interpret"))
def hybrid_polar_split(bmat: jnp.ndarray, rank: int, interpret: bool = False):
    """Production sequential-sweep split: XLA batch matmuls + ONE small
    Mosaic program for the serial subspace iteration.

    Same contract as ``polar_split_pallas`` / ``batched_cholqr_split``
    (canonical gauge ``Q (I, rank)`` isometric, ``R = Q^T B``, dead
    directions contracted). The work is placed by what each engine is
    good at, from the measured in-sweep decomposition at the flagship
    config (N=196 M=128 B=256, round 4):

      * sketch ``Y0 = B om``, Gram ``G = B B^T``, and ``R = Q^T B`` are
        MXU-shaped batch matmuls -> XLA, pipelined with the step's other
        ops, at the SWEEP's matmul precision (unannotated dots follow
        ``jax.default_matmul_precision``, so ``SweepConfig
        (matmul_precision="float32")`` still forces full precision).
        bf16 Gram measured quality-identical on the gapped two-site gate
        (iso 8.3e-7, capture parity with HIGHEST).
      * the polar-NS subspace iteration is ~60 serial 128-wide matmuls
        -- XLA pays ~2.5 us dispatch per op (results/
        profile_sweep_ablation.json), Mosaic runs them back-to-back at
        ~1.2 us/pass -> ``polar_iterate_pallas`` (n2 read off tr(G)).

    vs the all-Mosaic ``polar_split_pallas`` (which streams B through
    VMEM in J-tiles and pays the Gram at Precision.HIGHEST inside the
    kernel): 16.6 vs 20.9 ms/sweep at the flagship config. The all-Mosaic
    forms remain for the sharded splits (``parallel/dist_split.py``,
    where the J-streaming IS the sharding) and the fused step engine.
    """
    from tensornetworkforml_tpu.ops.svd import _rangefinder_omega

    out_dtype = bmat.dtype
    I, J = bmat.shape
    q_cols = min(rank, I)
    dead_tol = 1e-6 if bmat.dtype != jnp.float64 else 1e-12
    b32 = bmat if bmat.dtype == jnp.float32 else bmat.astype(jnp.float32)
    om = _rangefinder_omega(J, q_cols, jnp.float32)
    y0 = jnp.dot(b32, om)
    g = jnp.dot(b32, b32.T)
    q = polar_iterate_pallas(y0, g, dead_tol=dead_tol, interpret=interpret)
    if q_cols < rank:
        q = jnp.concatenate(
            [q, jnp.zeros((I, rank - q_cols), dtype=q.dtype)], axis=1
        )
    r = jnp.dot(q.T, b32)
    return q.astype(out_dtype), r.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rank", "n_power", "loop_coeffs", "final_coeffs", "interpret",
    ),
)
def polar_split_two_stage(
    bmat: jnp.ndarray,
    rank: int,
    n_power: int = 1,
    loop_coeffs: tuple = None,
    final_coeffs: tuple = None,
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
        n_power=n_power, loop_coeffs=loop_coeffs,
        final_coeffs=final_coeffs, dead_tol=dead_tol, interpret=interpret,
    )
    if q_cols < rank:
        q = jnp.concatenate(
            [q, jnp.zeros((I, rank - q_cols), dtype=q.dtype)], axis=1
        )
    with jax.default_matmul_precision("float32"):
        r = q.T @ bmat
    return q.astype(out_dtype), r.astype(out_dtype)
