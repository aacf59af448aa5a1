"""Factored two-site update: never materialise ``B_new`` at large bond.

The M=512 sweep is HBM-bound (BENCH_NOTES round-4/5: 22.7 GFLOP of
analytic step work streaming ~3x 42 MB ``(I, J)`` two-site intermediates
-- ``B_t``, ``deltaB``, ``B_new`` -- plus the split re-reading them).
But the updated two-site tensor is a sum of two STRUCTURED terms the
whole step can be computed from directly:

    B_new = c_t * B_t + c_g * grad
    B_t[i, o, j]  = label3[i, o, k] A2m[k, j]      (merge: low-"rank" in k)
    grad[i, o, j] = Lmat[b, i] w_t[b, o, j]        (outer product over batch)

with ``i = (a, d1)`` the row leg (I = M*D), ``o`` the label leg, ``j =
(d2, c)`` the column leg (J' = D*M), ``c_t = 1 - lr*gamma*wd`` and
``c_g = lr*gamma`` after L1 clipping. Every downstream consumer is a
linear map of ``B_new``:

  * sketch      ``Y = B_new @ Om``      -> two small matmul chains
  * power iter  ``Z = B_new (B_new^T Q)`` -> four chains
  * new core    ``R = Q^T B_new``       -> two chains
  * new output  ``f_new = Lmat . B_new . right`` -> (B, B) Gram forms

so the randomised subspace split (the same one-power-iteration
rangefinder + greedy Polar-Express orthonormalisation contract as
``ops.kernels.polar_split.gramfree_split``) runs WITHOUT ever forming
``(I, J)``. Only the reference's L1-clip statistics (``sum |B_t|``,
``sum |deltaB|`` -- ``Network_class.py:753-757``) and the Frobenius
norms feeding the rangefinder prescale are elementwise over the full
two-site tensor; those reduce ``B_t``/``deltaB`` where XLA fuses the
reductions into the producing matmuls, and ``B_new`` itself is never
written.

Semantics preserved exactly (same clip, same ascent step, same stale-
right/carried-left cache discipline): equivalence with the ``"xla"``
engine is tested in float64 in ``tests/test_factored_step.py``. The
carried ``f`` identity ``f == Lmat . B_t . right`` (exact by the cache
discipline -- both factors come from the same stale batch forward) lets
``f_new`` update incrementally, the same identity the engine's carried
``f`` already relies on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.models.mps import apply_act_fn, loss_derivative
from tensornetworkforml_tpu.ops.kernels.polar_split import (
    _colnorm,
    _pe_schedule,
    _PE_FINAL,
    _PE_LOOP,
    _polar_ns_greedy,
)
from tensornetworkforml_tpu.ops.svd import _rangefinder_omega

# Shortened greedy Polar-Express schedules for the LARGE-bond factored
# path: loop (3e-3, 0.3) = 4 passes and final (1e-6, 1e-7) = 12 passes
# vs the hybrid kernel's 5 + 14. Measured on the I=1024/q=512 gapped
# harness (results/iterate_variants.json 'aligned_high_short'): 551.8
# us vs 625.6, live-column isometry 1.05e-4, capture loss 7.6e-6. At
# SMALL q the colnormed iterate's spread is wider (less averaging over
# random directions) and l0 = 1e-6 measurably under-converges (bulk
# isometry 0.27 at q = 8) -- the standard (1e-3, 0.25)/(1e-7, 1e-7)
# pair stays in force below q = 512.
_PE_LOOP_F = (3e-3, 0.3)
_PE_FINAL_F = (1e-6, 1e-7)


def _iterate_xla(y0, g, n2, dead_tol, n_power: int = 1,
                 md=jax.lax.Precision.HIGHEST):
    """The iteration of ``polar_iterate_pallas``/``_iterate_kernel``
    (colnorm -> loop-NS -> G-multiply, then colnorm -> final-NS), as XLA
    ops: at I = 1024 the Mosaic form hits the VMEM-stack wall (round-4
    finding). Same op order as ``hybrid_polar_split`` (every stage is
    span-preserving, so the captured subspace matches); the pass
    schedules are the shortened ``_PE_*_F`` pair above.

    ``md`` sets the matmul precision of every NS dot and the power
    multiply. HIGHEST (6-pass bf16) is the hybrid-aligned default;
    HIGH (3-pass) measured BETTER live-column isometry (3.8e-5 vs
    3.2e-2 -- at HIGHEST the near-dead tail directions converge to
    unit-norm junk that HIGH's extra noise keeps contracted) at 0.58x
    the time on the I=1024/q=512 gapped harness, capture within 1e-5
    of exact (results/iterate_variants.json)."""
    big = y0.shape[1] >= 512
    loop_s = _pe_schedule(*(_PE_LOOP_F if big else _PE_LOOP))
    final_s = _pe_schedule(*(_PE_FINAL_F if big else _PE_FINAL))
    g = g / jnp.maximum(n2, 1e-30)
    y = y0
    for _ in range(n_power):
        y = _colnorm(y, dead_tol)
        y = _polar_ns_greedy(y, loop_s, md)
        y = jax.lax.dot_general(
            g, y, (((1,), (0,)), ((), ())),
            preferred_element_type=y.dtype, precision=md,
        )
    y = _colnorm(y, dead_tol)
    return _polar_ns_greedy(y, final_s, md)


def factored_supported(cfg, M: int, D: int) -> bool:
    """True when the factored path implements cfg's exact semantics."""
    return (
        not cfg.L2_flag
        and cfg.split_mode == "canonical"
        and cfg.svd_method == "polar"
        and cfg.rank_mode == "fixed"
        and cfg.dist_split == "none"
    )


def two_site_update_factored(
    label_site: jnp.ndarray,
    A2: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    l_env: jnp.ndarray,
    r_env: jnp.ndarray,
    y_onehot: jnp.ndarray,
    f: jnp.ndarray,
    lr,
    weight_dec,
    T: float,
    cfg,
):
    """Drop-in replacement for the large-M ``two_site_update`` body.

    Returns ``(A_left, label_new, l_env_new, f_new, metrics)`` -- the
    caller supplies the unchanged ``E2`` carry (L2 is unsupported here).
    """
    M, D, L, _ = label_site.shape
    I = M * D
    Jp = D * M  # the (d2, c) column leg; full J = L * Jp
    dtype = label_site.dtype
    f32 = jnp.float32

    label3 = label_site.reshape(I, L, M)
    A2m = A2.reshape(M, Jp)

    # metrics on the CURRENT output (pre-update), reference discipline
    f_act = apply_act_fn(f, cfg.act_fn, T)
    zero = jnp.zeros((), dtype=dtype)
    if cfg.step_metrics:
        y_pred = jnp.argmax(f_act, axis=0)
        y_true = jnp.argmax(y_onehot, axis=0)
        acc = jnp.mean((y_pred == y_true).astype(dtype))
        mae = jnp.mean(jnp.abs(y_onehot - f_act))
    else:
        acc = mae = zero

    loss_der = loss_derivative(f_act, y_onehot, cfg.loss_fn, cfg.act_fn, T)
    Lmat = jnp.einsum("ba,bi->bai", l_env, x1).reshape(-1, I)  # (B, I)
    rp = jnp.einsum("bj,bc->bjc", x2, r_env).reshape(-1, Jp)  # (B, J')
    w_t = jnp.einsum("ob,bj->boj", loss_der, rp)  # (B, L, J')

    # ---- clip statistics: the ONLY full (I, L, J') elementwise work ----
    # XLA fuses the abs/square reductions into these two dots' consumers;
    # B_new itself is never formed.
    B_t = jnp.einsum("iok,kj->ioj", label3, A2m)
    grad = jnp.einsum("bi,boj->ioj", Lmat, w_t)
    delta = grad - weight_dec * B_t
    s_B = jnp.sum(jnp.abs(B_t))
    s_dB = jnp.sum(jnp.abs(delta))

    if cfg.update_mode == "normalized":
        gamma = jnp.where(s_dB > 0, s_B / jnp.maximum(s_dB, 1e-30), 0.0)
    else:  # L1 clip (Network_class.py:753-757)
        gamma = jnp.where(s_dB > s_B, s_B / s_dB, 1.0)
    step = lr * gamma
    # B_new = B_t + step*(grad - wd*B_t) = c_t*B_t + c_g*grad
    c_t = 1.0 - step * weight_dec
    c_g = step

    if cfg.growth_cap > 0:
        # s_new = sum|B_new| needs the elementwise view once more; still
        # fused over the already-live B_t/delta pair
        s_new = jnp.sum(jnp.abs(B_t + step * delta))
        cap = (1.0 + cfg.growth_cap) * s_B
        g2 = jnp.where(s_new > cap, cap / jnp.maximum(s_new, 1e-30), 1.0)
        c_t = c_t * g2
        c_g = c_g * g2

    # ---- factored Gram: G = B_new B_new^T is only (I, I) ----------------
    # and every term comes from the factors -- the round-4 "no (I, I)
    # Gram" rule was about STREAMING B to build it; factored, it is the
    # cheapest route and reuses hybrid_polar_split's exact iteration.
    GA = A2m @ A2m.T  # (M, M)
    T5 = jnp.einsum("iok,km->iom", label3, GA)
    G_tt = jnp.einsum("iom,jom->ij", T5, label3)
    T4 = jnp.einsum("boj,kj->bok", w_t, A2m)
    P3 = jnp.einsum("iok,bok->ib", label3, T4)  # B_t grad^T factor
    G_x = P3 @ Lmat
    W2 = jnp.einsum("boj,coj->bc", w_t, w_t)
    G_gg = Lmat.T @ (W2 @ Lmat)
    gram = (
        jnp.square(c_t) * G_tt
        + (c_t * c_g) * (G_x + G_x.T)
        + jnp.square(c_g) * G_gg
    )
    n2_new = jnp.trace(gram)

    # ---- sketch Y0 = B_new @ Om, factored -------------------------------
    # A Y0 = G @ Omega_I gram sketch (1 GF vs this 14 GF chain) was
    # built and measured -- REJECTED: forming the f32 Gram squares the
    # spectrum against machine eps, so kept directions below ~sqrt(eps)
    # are corrupted at ENTRY and no amount of subsequent iteration
    # recovers them (capture loss 2.5e-4 vs this chain's ~3e-7 on the
    # gapped harness, results/iterate_variants.json). The sigma^1
    # sketch below keeps deep directions 1e3 x above the noise floor.
    q_cols = min(M, I)
    om = _rangefinder_omega(L * Jp, q_cols, f32).astype(dtype).reshape(
        L, Jp, q_cols
    )
    av = jnp.einsum("kj,ojm->okm", A2m, om)
    y_t = jnp.einsum("iok,okm->im", label3, av)
    wom = jnp.einsum("boj,ojm->bm", w_t, om)
    y0 = c_t * y_t + c_g * (Lmat.T @ wom)

    # iteration dtype: f32 floor (bf16 NS diverges), f64 honored.
    # Precision: HIGH (3-pass bf16) -- measured 0.58x the HIGHEST time
    # with BETTER live-column isometry and capture within measurement
    # noise of exact (results/iterate_variants.json 'aligned_high').
    it_dt = jnp.float64 if dtype == jnp.float64 else f32
    dead_tol = 1e-6 if it_dt != jnp.float64 else 1e-12
    md = (jax.lax.Precision.HIGHEST if it_dt == jnp.float64
          else jax.lax.Precision.HIGH)
    with jax.default_matmul_precision("float32"):
        q = _iterate_xla(
            y0.astype(it_dt), gram.astype(it_dt), n2_new.astype(it_dt),
            dead_tol, md=md,
        ).astype(dtype)
    if q_cols < M:
        q = jnp.concatenate(
            [q, jnp.zeros((I, M - q_cols), dtype=dtype)], axis=1
        )

    # R = Q^T B_new -> the new label core (M, L, J')
    qlab = jnp.einsum("iok,im->mok", label3, q)
    r_t = jnp.einsum("mok,kj->moj", qlab, A2m)
    qL = Lmat @ q  # (B, m)
    r_g = jnp.einsum("bm,boj->moj", qL, w_t)
    r = c_t * r_t + c_g * r_g

    A_left = q.reshape(M, D, M)
    label_new = r.reshape(M, L, D, M).transpose(0, 2, 1, 3)

    # ---- new output: carried-f identity + (B, B) Gram forms ------------
    C1 = Lmat @ Lmat.T  # (B, B)
    D2 = jnp.einsum("boj,cj->obc", w_t, rp)  # (L, B, B)
    f_grad = jnp.einsum("cb,obc->oc", C1, D2)
    f_new = c_t * f + c_g * f_grad

    l_env_new = qL  # == Lmat @ q, already computed for R

    if cfg.renorm_envs:
        g = 1.0 / jnp.maximum(
            jnp.mean(jnp.linalg.norm(l_env_new, axis=1)), 1e-30
        )
        A_left = A_left * g
        l_env_new = l_env_new * g
        label_new = label_new / g

    if cfg.step_metrics:
        metrics = {
            "accuracy": acc,
            "MAE": mae,
            "sum_abs_B": s_B,
            "sum_abs_deltaB": s_dB,
            "mean_abs_f": jnp.mean(jnp.abs(f)),
            "L2_loss": zero,
            "sum_abs_L2_grad": weight_dec * s_B,
        }
    else:
        metrics = {
            "accuracy": zero, "MAE": zero, "sum_abs_B": zero,
            "sum_abs_deltaB": zero, "mean_abs_f": zero,
            "L2_loss": zero, "sum_abs_L2_grad": zero,
        }
    return A_left, label_new, l_env_new, f_new, metrics
