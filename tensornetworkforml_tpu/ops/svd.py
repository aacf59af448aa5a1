"""Truncated SVD split of the two-site tensor.

The reference splits the merged two-site tensor B back into two site tensors
with ``np.linalg.svd``, multiplying sqrt(S) into BOTH factors for stability
and truncating middle bonds to the pre-merge bond dimension
(``Network_class.py:839-962``; the adaptive variance threshold there is dead
code, see its docstring at :870). With the padded uniform representation the
truncation rank is always the static bond dimension M, which keeps shapes
static under ``jit``/``scan``.

Backends:
  * ``"svd"``  -- ``jnp.linalg.svd`` (CPU-accurate; what tests use in x64).
  * ``"gram"`` -- eigendecomposition of the smaller Gram matrix ``B B^T``.
    ~2x faster than the SVD lowering inside the sweep scan on TPU, but it
    squares the condition number and TPU's float32 eigh is not accurate
    enough for the squared spectrum: canonical-mode training DIVERGES
    (forcing full matmul precision and Newton-Schulz re-orthonormalisation
    do not rescue it), while the identical code trains to 100% on CPU
    float32. Use on CPU/float64; ``"svd"`` is the correct TPU default.
  * ``"rangefinder"`` -- randomized subspace split (canonical mode only):
    sketch + Rayleigh-Ritz + QR-polished subspace iteration. The TPU-fast
    production split for canonical sweeps; auto-dispatches to the fused
    Pallas kernel for I >= 128.
  * ``"cholqr"`` -- matmul/Cholesky-only subspace split (canonical mode
    only): exact-rank sketch + CholQR-orthonormalized power iterations
    (``batched_cholqr_split``). No qr/eigh/svd lowering at all; built for
    batched use (brick-wall layers) and as a latency-minimal sequential
    split.
  * ``"cholsvd"`` -- SVD of the Cholesky factor of ``B B^T`` (true
    singular values from a small square SVD).
  * ``"polar"`` -- hybrid polar-NS split (canonical mode only): XLA
    computes the MXU-shaped sketch/Gram/R matmuls, ONE small Mosaic
    program runs the serial matmul-only Newton-Schulz subspace
    iteration (``ops/kernels/polar_split.py::hybrid_polar_split``).
    Built because round-3/4 profiling showed EVERY XLA-composed split
    is floored near ~150 us/step by per-op dispatch latency (~2.5
    us/op, ~30 us per Cholesky+solve) while all-Mosaic forms pay VMEM
    streaming + HIGHEST-precision Gram inside the kernel; the hybrid
    splits the work by what each engine is good at (the fastest
    measured sequential-sweep split: 16.6 ms flagship sweep).
"""

from __future__ import annotations

import jax.numpy as jnp


def truncated_svd_split(
    bmat: jnp.ndarray,
    rank: int,
    method: str = "svd",
    keep=None,
    split_mode: str = "shared",
    adaptive_tol: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split ``bmat (I, J)`` into ``(I, rank) @ (rank, J)``.

    ``split_mode``:
      * ``"shared"``    -- ``(U sqrt(S), sqrt(S) V^h)``: sqrt(S) shared
        between the factors as in the reference
        (``Network_class.py:871, 912-915``).
      * ``"canonical"`` -- ``(U, S V^h)``: the left factor is an isometry and
        ALL weight travels with the label core. This keeps the MPS in
        mixed-canonical form during sweeps, the standard DMRG gauge the
        reference lacks; environment and transfer products then have norms
        <= 1 and large-N float32 training cannot blow up (the reference's
        own report, section VI, identifies this instability as why it never
        learned MNIST).

    ``keep`` (optional, traced int) additionally zeroes singular values
    beyond the first ``keep`` -- equivalent to a harder truncation but with
    static output shapes, used to reproduce the reference's evolving
    bond-rank rule (``Network_class.py:894-910``) inside a compiled scan.

    ``adaptive_tol`` > 0 enables ADAPTIVE rank truncation: after the
    fixed-``rank`` cut, trailing singular values are additionally zeroed
    so that the retained spectral ENERGY (sum of squares) is the smallest
    prefix >= ``1 - adaptive_tol`` of the rank-``rank`` energy -- i.e. the
    cumulative-variance threshold the reference computed but never used
    (dead code, ``Network_class.py:890-891``, docstring :870 "still to be
    tested"), implemented with static shapes via the same masking as
    ``keep``. Only the spectrum-producing methods (``svd``, ``cholsvd``)
    support it. Mutually exclusive with ``keep``.

    ``rank`` must be <= min(I, J).
    """
    if adaptive_tol > 0.0:
        if keep is not None:
            raise ValueError("adaptive_tol and keep are mutually exclusive")
        if method not in ("svd", "cholsvd"):
            raise ValueError(
                "adaptive_tol requires a spectrum-producing split method "
                "('svd' or 'cholsvd'), got " + repr(method)
            )
    if method == "svd":
        U, S, Vh = jnp.linalg.svd(bmat, full_matrices=False)
        U = U[:, :rank]
        S = S[:rank]
        Vh = Vh[:rank, :]
        if keep is not None:
            S = jnp.where(jnp.arange(rank) < keep, S, 0.0)
        if adaptive_tol > 0.0:
            S = S * _adaptive_energy_mask(S, adaptive_tol)
        S = jnp.maximum(S, 0.0)
        if split_mode == "canonical":
            if keep is not None or adaptive_tol > 0.0:
                # Zero U's columns past `keep` too: the left factor becomes a
                # live site tensor, and un-zeroed columns would leak weight
                # into bond slots beyond the reference truncation rank on
                # later steps (the right factor's rows alone don't protect
                # the next merge).
                U = U * (S > 0).astype(bmat.dtype)[None, :]
            return U, S[:, None] * Vh
        sqrt_s = jnp.sqrt(S)
        return U * sqrt_s[None, :], sqrt_s[:, None] * Vh
    elif method == "gram":
        return _gram_split(bmat, rank, keep, split_mode)
    elif method == "cholsvd":
        return _chol_svd_split(bmat, rank, keep, split_mode, adaptive_tol)
    elif method == "cholqr":
        if split_mode != "canonical":
            raise ValueError("cholqr split requires split_mode='canonical'")
        if keep is not None:
            raise ValueError(
                "cholqr split does not support rank_mode='reference'"
            )
        q, r = batched_cholqr_split(bmat[None], rank)
        return q[0], r[0]
    elif method == "polar":
        # fused Pallas polar-NS split (ops/kernels/polar_split.py): the
        # latency-minimal TPU split -- ONE kernel + one matmul instead of
        # ~15 latency-bound XLA ops (the measured floor of any XLA-composed
        # split, results/profile_sweep_ablation.json). Interpret-mode on
        # non-TPU backends keeps the numerics identical for tests.
        if split_mode != "canonical":
            raise ValueError("polar split requires split_mode='canonical'")
        if keep is not None:
            raise ValueError(
                "polar split does not support rank_mode='reference'"
            )
        import jax

        from tensornetworkforml_tpu.ops.kernels.polar_split import (
            hybrid_polar_split,
        )

        # Production form (round 4): the HYBRID split -- XLA sketch/Gram/R
        # matmuls + one small Mosaic program for the serial NS iteration
        # (hybrid_polar_split docstring has the measured decomposition;
        # 16.6 vs 20.9 ms flagship sweep against the all-Mosaic kernel).
        # Mosaic compile limits, bisected on hardware (round 3): input/
        # output blocks >= ~3 MB crash the remote compiler. The hybrid
        # iterate kernel holds Y (I, q) + G (I, I) + Q in VMEM -- G hits
        # the block limit above I = 768; beyond that the GRAM-FREE form
        # (round 4) removes the (I, I) array entirely via
        # G @ y = B (B^T y), unlocking I >= 1024 (M >= 512).
        I = bmat.shape[0]
        on_tpu = jax.default_backend() == "tpu"
        if I > 768 and on_tpu:
            from tensornetworkforml_tpu.ops.kernels.polar_split import (
                gramfree_split,
            )

            return gramfree_split(bmat, rank)
        return hybrid_polar_split(bmat, rank, interpret=not on_tpu)
    elif method == "rangefinder":
        # auto-dispatch: above the crossover the fused Pallas kernel beats
        # the XLA qr/eigh chain (whose latency grows badly with size):
        # measured sweeps at N=196/B=256 -- I=128 (M=64): 134 -> 45 ms
        # (3x); I=256 (M=128): 369 -> 178 ms (2.1x); I=64 (M=32) the XLA
        # path stays faster (12.8 vs 20 ms).
        if _pallas_split_applicable(bmat, keep, split_mode):
            from tensornetworkforml_tpu.ops.kernels.split_kernel import (
                rangefinder_split_pallas,
            )

            return rangefinder_split_pallas(bmat, rank)
        return _rangefinder_split(bmat, rank, keep, split_mode)
    elif method == "rangefinder_pallas":
        if split_mode != "canonical":
            raise ValueError(
                "rangefinder split requires split_mode='canonical'"
            )
        if keep is not None:
            raise ValueError(
                "rangefinder split does not support rank_mode='reference'"
            )
        import jax

        if jax.default_backend() != "tpu":
            # same contract and quality; the fused kernel is TPU-only
            return _rangefinder_split(bmat, rank, keep, split_mode)
        from tensornetworkforml_tpu.ops.kernels.split_kernel import (
            rangefinder_split_pallas,
        )

        return rangefinder_split_pallas(bmat, rank)
    else:
        raise ValueError(f"unknown SVD method {method!r}")


def _adaptive_energy_mask(S: jnp.ndarray, adaptive_tol: float) -> jnp.ndarray:
    """Static-shape mask keeping the smallest spectral prefix whose energy
    is >= ``1 - adaptive_tol`` of the total (the reference's unused
    cumulative-variance rule, ``Network_class.py:890-891``). Position i is
    kept iff the energy BEFORE it is still below the threshold, so the
    first index crossing the threshold is the last one kept. All-zero
    spectra keep nothing (0 < threshold * 0 is False)."""
    e = S.astype(jnp.float32) ** 2
    total = jnp.sum(e)
    prev = jnp.cumsum(e) - e  # energy strictly before each position
    return (prev < (1.0 - adaptive_tol) * total).astype(S.dtype)


def _pallas_split_applicable(bmat, keep, split_mode) -> bool:
    import jax

    return (
        split_mode == "canonical"
        and keep is None
        and bmat.shape[0] >= 128
        and jax.default_backend() == "tpu"
        # single chip only: the kernel inside a GSPMD-partitioned program
        # is unvalidated (no multi-chip hardware available); meshes keep
        # the XLA rangefinder, which GSPMD partitions like any other HLO
        and jax.device_count() == 1
    )


def _rangefinder_omega(J: int, rank: int, dtype):
    """Fixed random test matrix (trace-time constant, shape-keyed)."""
    import jax

    om = jax.random.normal(
        jax.random.PRNGKey(0x52464E44), (J, rank), dtype=jnp.float32
    )
    return om.astype(dtype)


def _rangefinder_split(
    bmat: jnp.ndarray, rank: int, keep=None, split_mode: str = "canonical",
    n_power: int = 0, oversample: int = 16, n_polish: int = 1,
):
    """Randomized rangefinder split: ``(Q, Q^T B)`` with ``Q`` an exact
    isometry spanning (approximately) the top-``rank`` row space of B.

    CANONICAL MODE ONLY. In the mixed-canonical gauge the split's only
    load-bearing outputs are an isometric left factor and the projected
    right factor -- the function the chain computes depends on Q only
    through the projector ``Q Q^T`` (any basis rotation inside the kept
    subspace is gauge). So the exact singular vectors are NOT needed,
    only their span -- and the measured two-site spectra during canonical
    training have a genuine gap at the bond dimension (sigma_M+1/sigma_M
    as low as 0.06, optimal truncation keeping >= 99.9% of the energy),
    which one power iteration on a random rangefinder basis captures to
    ~1e-4 of optimal. This replaces the TPU-slow exact SVD
    (reference ``Network_class.py:887``) with ~5 matmuls + one thin QR.

    Contrast with round 1's "warm-started subspace iteration" negative
    result: that ablation demanded CONVERGENCE of the iteration to the
    exact singular basis, which flat intra-subspace spectra prevent --
    but gauge freedom makes that convergence unnecessary.

    NOTE: unlike the exact SVD, Q's trailing columns may be nonzero in
    padded (edge) bond slots when rank(B) < rank; the computed function is
    unaffected (the right factor's corresponding rows are ~0), but the
    evolving-rank parity of ``rank_mode="reference"`` is not preserved --
    the combination is rejected.
    """
    if split_mode != "canonical":
        raise ValueError("rangefinder split requires split_mode='canonical'")
    if keep is not None:
        raise ValueError(
            "rangefinder split does not support rank_mode='reference'"
        )
    import jax

    I, J = bmat.shape
    q_cols = min(rank + oversample, I)
    with jax.default_matmul_precision("float32"):
        # Frobenius prescaling: the canonical gauge concentrates the whole
        # chain's scale in this tensor (|B| up to ~1e11 in f32 training),
        # and squared intermediates at that scale degrade the TPU eigh and can
        # break the TPU QR outright. With bs = B/|B|_F every internal
        # quantity is O(1); the subspace is scale-invariant.
        bn = jnp.maximum(jnp.linalg.norm(bmat), 1e-30)
        bs = bmat / bn
        # rangefinder: oversampled sketch of the row space
        om = _rangefinder_omega(J, q_cols, bmat.dtype)
        y = bs @ om  # (I, q_cols)
        norms = jnp.linalg.norm(y, axis=0, keepdims=True)
        y = y / jnp.maximum(norms, 1e-30)
        y, _ = jnp.linalg.qr(y)
        for _ in range(n_power):  # orthonormalized power iterations
            y = bs @ (bs.T @ y)
            norms = jnp.linalg.norm(y, axis=0, keepdims=True)
            y = y / jnp.maximum(norms, 1e-30)
            y, _ = jnp.linalg.qr(y)
        if q_cols > rank:
            # Rayleigh-Ritz: top-`rank` of the q_cols-dim compression.
            # W = (bs^T y)^T (bs^T y) is the projected Gram; its top
            # eigenvectors rotate y onto the dominant subspace. The spectrum
            # gap at the bond dimension (measured sigma_M+1/sigma_M down to
            # ~0.06 during canonical training) makes the small problem easy.
            z = bs.T @ y  # (J, q_cols)
            w = z.T @ z  # (q_cols, q_cols) PSD
            evals, evecs = jnp.linalg.eigh(w)  # ascending
            v = evecs[:, ::-1][:, :rank]  # top-`rank` Ritz vectors
            y = y @ v  # (I, rank)
        # TPU float32 eigh is not accurate enough on this SQUARED spectrum
        # (the round-1 gram-split finding); the eigh only SEEDS the
        # subspace, and two orthonormalized subspace iterations on the
        # ONCE-squared Gram bs bs^T -- driven by backward-stable Householder
        # QR -- repair the cross-gap mixing at (sigma_{M+1}/sigma_M)^{2k}.
        # (Iterating on W itself would be sigma^4 dynamics, which in f32
        # numerically annihilates the bottom of the kept block.) Measured on
        # real training bmats: one polish iteration lifts the worst-case
        # capture from 0.99981 (raw TPU eigh) to 1-6e-7.
        q = y
        for _ in range(n_polish):
            q = bs @ (bs.T @ q)
            norms = jnp.linalg.norm(q, axis=0, keepdims=True)
            q = q / jnp.maximum(norms, 1e-30)
            q, _ = jnp.linalg.qr(q)
        return q, q.T @ bmat


def batched_cholqr_split(
    bmats: jnp.ndarray,
    rank: int,
    n_power: int = 3,
    eps: float = None,
):
    """Batched canonical splits with NO qr/eigh/svd anywhere: Gaussian
    sketch at exact ``rank`` + CholQR-orthonormalized power iterations +
    a final CholQR2 pass. ``bmats (K, I, J)`` -> ``(Q (K, I, rank),
    Q^T B (K, rank, J))``.

    Built for the brick-wall trainer (``train/brickwall.py``), which needs
    K = N/2 independent splits per layer: vmapping the XLA rangefinder
    pays a batched qr+eigh chain (measured 11.3 ms for K=98 splits of
    (64, 64) at M=32; 73 ms at M=128), while this path is matmuls +
    batched Cholesky + batched triangular solves only -- 3.3 ms / 4 ms on
    the same workloads with equivalent subspace capture (min 1-2e-7 on
    real mid-training tensors, whose spectra gap hard at the bond
    dimension: median sigma_{rank+1}/sigma_rank = 0.004).

    Numerics: every iterate is column-normalized then CholQR'd with a
    trace-scaled ridge, so rank-deficient pairs are safe -- dead
    directions come out CONTRACTED (|Q_col| < 1), never as junk unit
    columns (same semantics as the ridged Newton-Schulz in the Pallas
    kernel). Oversampling + Rayleigh-Ritz are deliberately absent: with a
    hard spectral gap the power iterations alone order the subspace, and
    oversampled trailing columns decay to noise that breaks the batched
    Cholesky (measured: the oversampled+RR variant NaNs).

    VALIDITY DOMAIN (f32): the KEPT spectral block must span <= ~3
    decades. Power iterations act on randomly-mixed sketch columns, so a
    kept direction at sigma/sigma_max < ~1e-3 falls below f32 resolution
    within its column after the sigma^2-weighted applications and is
    numerically annihilated before orthogonalization can separate it
    (the rangefinder survives this because Rayleigh-Ritz separates
    directions BEFORE powering). Measured mid-training two-site spectra
    in this framework keep >= 99.9% of energy within ~2 decades, and all
    training-quality gates hold at parity with the exact SVD -- but for
    regimes with wide kept spectra use ``rangefinder`` or ``svd``
    (``tests/test_brickwall.py::test_cholqr_wide_spectrum_contract``
    pins this behavior).

    Replaces, for the brick layer only, the per-step exact SVD of the
    reference (``Network_class.py:887``).
    """
    import jax

    out_dtype = bmats.dtype
    if out_dtype == jnp.bfloat16:
        # bf16 machine-eps (~8e-3) swamps any usable Cholesky ridge;
        # factor in f32 and cast the factors back (same policy as the
        # sweep engine's pre-split upcast, train/sweep.py)
        bmats = bmats.astype(jnp.float32)
    K, I, J = bmats.shape
    if eps is None:
        eps = _cholqr_eps(bmats.dtype, min(rank, I))

    with jax.default_matmul_precision("float32"):
        # Frobenius prescale per pair (same rationale as _rangefinder_split)
        bn = jnp.maximum(
            jnp.sqrt(jnp.sum(bmats * bmats, axis=(-2, -1), keepdims=True)),
            1e-30,
        )
        bs = bmats / bn
        om = _rangefinder_omega(J, min(rank, I), bmats.dtype)
        y = jnp.einsum("kij,jq->kiq", bs, om)
        g = jnp.einsum("kij,klj->kil", bs, bs)  # (K, I, I) Gram, formed once
        q = _cholqr_subspace(g, y, eps, n_power)
        r = jnp.einsum("kim,kij->kmj", q, bmats)
        return q.astype(out_dtype), r.astype(out_dtype)


def _cholqr_eps(dtype, q_cols: int) -> float:
    """Cholesky ridge for the cholqr splits.

    The ridge must dominate the Cholesky's ROUNDOFF on the (unit-
    diagonal) Gram of normalized columns, or rank-deficient batches
    (e.g. the traveling-label chain's zero-padded edge tensors, rank
    as low as 2 with q ~ 2M columns) make trailing pivots negative
    and the factorization NaNs, which the live-column mask then
    propagates to an all-zero model. Roundoff grows with the COLUMN
    COUNT q, so the ridge must too: a fixed 1e-5 passed at q <= 128
    but measured all-zero at q = 256 (M=256 traveling-label, step-1
    split dead at eps=1e-5, alive at 1e-4). 8*q*machine-eps gives
    3e-5 at q=32 .. 4.9e-4 at q=512; the isometry deviation it
    costs (~eps/2) stays far below the bf16 contraction noise.
    """
    if dtype == jnp.float64:
        return max(1e-12, 8.0 * q_cols * 2.22e-16)
    return max(1e-5, 8.0 * q_cols * 1.19e-7)


def _cholqr_subspace(g, y, eps, n_power: int):
    """Shared cholqr subspace-iteration core: power iterations of the Gram
    ``g (K, I, I)`` on the sketch ``y (K, I, q)``, every iterate column-
    normalized then CholQR'd with the ``eps`` ridge, finished by a CholQR2
    pass. Returns the isometric factor ``(K, I, q)``.

    Factored out so the bond-distributed split
    (``parallel/dist_split.py``) shares these numerics EXACTLY: there the
    (I, I)/(I, q)-shaped work below is replicated per device while the
    J-dimension matmuls producing ``g``/``y`` are column-sharded psums.

    Dead-column contract: columns below ``dead_tol`` of the batch max are
    DEAD directions (rank-deficient pairs, e.g. the traveling-label
    chain's zero-padded edge tensors). They must go to EXACTLY zero, not
    be normalized: dividing a numerically-zero column by the 1e-30 floor
    overflows float32 to Inf and NaNs the Cholesky, and even when it
    survives, the inflated noise column leaks weight into bond slots the
    padded representation needs zero (f32 training collapses -- measured).
    Zero columns ride through cholqr as zeros (the ridge keeps W PD and
    the solve returns zero columns), so Q keeps the live isometry block
    plus exact-zero dead slots -- the same contract as the masked SVD.
    """
    import jax

    dead_tol = 1e-6 if y.dtype != jnp.float64 else 1e-12
    ee = jnp.eye(y.shape[-1], dtype=y.dtype)

    def colnorm(y):
        n = jnp.linalg.norm(y, axis=-2, keepdims=True)
        n_max = jnp.max(n, axis=-1, keepdims=True)
        live = (n > dead_tol * n_max) & jnp.isfinite(n)
        return jnp.where(live, y / jnp.maximum(n, 1e-30), 0.0)

    def cholqr(y):
        w = jnp.einsum("kiq,kip->kqp", y, y)
        scale = jnp.max(jnp.diagonal(w, axis1=-2, axis2=-1), axis=-1)
        scale = jnp.maximum(scale, 1e-30)
        c = jnp.linalg.cholesky(w + (eps * scale)[:, None, None] * ee)
        return jax.lax.linalg.triangular_solve(
            c, y, left_side=False, lower=True, transpose_a=True
        )

    for _ in range(n_power):
        y = cholqr(colnorm(y))
        y = jnp.einsum("kil,klq->kiq", g, y)
    return cholqr(cholqr(colnorm(y)))


def _chol_svd_split(
    bmat: jnp.ndarray, rank: int, keep=None, split_mode: str = "shared",
    adaptive_tol: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Truncated split via SVD of the CHOLESKY factor of the Gram matrix.

    For wide ``B (I, J)``: ``G = B B^T = C C^T`` (Cholesky), and
    ``svd(C) = U S W^h`` gives exactly the left singular vectors U and
    singular values S of B -- but the SVD runs on the small SQUARE ``(I, I)``
    factor instead of the full ``(I, J)`` matrix, skipping the expensive
    wide bidiagonalisation (the sweep's dominant cost: B is ``(2M, L*D*M)``).

    U is orthonormal BY CONSTRUCTION (it comes out of a real SVD), unlike
    the ``gram`` eigh path whose TPU float32 eigenvectors are unusable.
    The squared condition number only affects singular values below
    ~sqrt(eps)*smax (~3e-4 relative in float32) whose contribution to the
    network function is O(eps) -- negligible truncation-error increase.
    A trace-scaled jitter keeps the Cholesky defined for the rank-deficient
    padded two-site tensors.
    """
    import jax

    I, J = bmat.shape
    assert I <= J, "cholsvd split expects a wide matrix"
    with jax.default_matmul_precision("float32"):
        gram = bmat @ bmat.T  # (I, I) PSD
        gram = 0.5 * (gram + gram.T)  # exact symmetry for the Cholesky
        eps = jnp.asarray(
            1e-6 if bmat.dtype != jnp.float64 else 1e-13, dtype=bmat.dtype
        )
        scale = jnp.max(jnp.diagonal(gram)) + jnp.asarray(1e-30, bmat.dtype)
        C = jnp.linalg.cholesky(
            gram + (eps * scale) * jnp.eye(I, dtype=bmat.dtype)
        )
        U, S, _ = jnp.linalg.svd(C, full_matrices=False)  # small square SVD
        U = U[:, :rank]
        S = S[:rank]
        if keep is not None:
            S = jnp.where(jnp.arange(rank) < keep, S, 0.0)
        if adaptive_tol > 0.0:
            S = S * _adaptive_energy_mask(S, adaptive_tol)
        if split_mode == "canonical":
            svh = U.T @ bmat
            if keep is not None or adaptive_tol > 0.0:
                mask = (S > 0).astype(bmat.dtype)
                svh = svh * mask[:, None]
                U = U * mask[None, :]  # no weight leak past the kept rank
            return U, svh
        sqrt_s = jnp.sqrt(jnp.maximum(S, 0.0))
        inv_sqrt = jnp.where(S > 0, 1.0 / jnp.maximum(sqrt_s, 1e-30), 0.0)
        return U * sqrt_s[None, :], inv_sqrt[:, None] * (U.T @ bmat)


def _gram_split(
    bmat: jnp.ndarray, rank: int, keep=None, split_mode: str = "shared"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Truncated split via eigh of the smaller Gram matrix.

    Only implemented for I <= J with the left factor from the Gram side
    (always the case for the two-site tensor, rows (M*D) <= cols (L*D*M)).

    The whole split is traced under full float32 matmul precision: on TPU
    the default bf16 MXU passes corrupt the eigh's eigenvectors enough to
    diverge canonical-mode training (squared condition number); forcing
    precision only here keeps the rest of the sweep at fast default
    precision.
    """
    import jax

    with jax.default_matmul_precision("float32"):
        return _gram_split_impl(bmat, rank, keep, split_mode)


def _gram_split_impl(
    bmat: jnp.ndarray, rank: int, keep=None, split_mode: str = "shared"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    I, J = bmat.shape
    if I > J:
        # tall case: recurse on the transpose (swaps the factors). The
        # canonical gauge is left-sided, so only 'shared' supports this.
        assert split_mode == "shared", "canonical gram split expects wide"
        right, left = _gram_split(bmat.T, rank, keep, split_mode)
        return left.T, right.T
    gram = bmat @ bmat.T  # (I, I), symmetric PSD
    evals, evecs = jnp.linalg.eigh(gram)  # ascending
    # top-`rank` eigenpairs
    evals = evals[::-1][:rank]
    U = evecs[:, ::-1][:, :rank]  # (I, rank)
    if keep is not None:
        evals = jnp.where(jnp.arange(rank) < keep, evals, 0.0)
    S = jnp.sqrt(jnp.maximum(evals, 0.0))
    if split_mode == "canonical":
        # eigh of the squared spectrum loses orthogonality of the small-
        # eigenvalue columns in float32; two Newton-Schulz iterations
        # (matmuls only, MXU-friendly) restore an isometric U, and the
        # right factor is the exact projection U^T B.
        for _ in range(2):
            U = 1.5 * U - 0.5 * U @ (U.T @ U)
        svh = U.T @ bmat
        if keep is not None:
            mask = (S > 0).astype(bmat.dtype)
            svh = svh * mask[:, None]
            U = U * mask[None, :]  # no weight leak past the kept rank
        return U, svh
    sqrt_s = jnp.sqrt(S)
    # sqrt(S) V^h = sqrt(S) S^{-1} U^T B ; guard zero singular values
    inv = jnp.where(S > 0, 1.0 / jnp.maximum(S, 1e-30), 0.0)
    svh = (sqrt_s * inv)[:, None] * (U.T @ bmat)
    return U * sqrt_s[None, :], svh
