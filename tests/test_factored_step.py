"""factored_update (train/factored_step.py): the large-bond step that
never materialises B_new.

Equivalence testing note: the two-site sweep is CHAOTIC at toy shapes --
a 1e-6 input perturbation on the XLA engine amplifies to ~1e-4 in its
own output after one N=10 sweep (measured; truncation feedback), so
reassociated-arithmetic engines can only be compared tightly at the
SINGLE-STEP level or against an explicit same-algorithm oracle in
float64. Sweep-level checks compare QUALITY metrics, the repo's parity
discipline for gauge- and chaos-affected quantities (CLAUDE.md).
"""

import numpy as np

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp
import pytest

from tensornetworkforml_tpu.models.mps import mps_forward, product_init
from tensornetworkforml_tpu.ops.contractions import (
    boundary_vector,
    chain_scores,
    right_env_stack_fused,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.ops.svd import _rangefinder_omega
from tensornetworkforml_tpu.train.factored_step import (
    _iterate_xla,
    two_site_update_factored,
)
from tensornetworkforml_tpu.train.sweep import (
    SweepConfig,
    sweep_once,
    two_site_update,
)


def _setup(N=10, M=8, L=3, B=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = rng.random((B, N))
    mps = product_init(jax.random.PRNGKey(1), N=N, M=M, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=dtype,
                       calibration_x=x)
    phi = psi_embed(jnp.asarray(x, dtype=dtype))
    y1h = jnp.asarray(np.eye(L, dtype=np.float64)[rng.integers(0, L, B)].T,
                      dtype=dtype)
    return mps, phi, y1h


def _cfg(factored, **kw):
    base = dict(act_fn="linear", loss_fn="MSE", L2_flag=False,
                split_mode="canonical", svd_method="polar",
                factored_update=factored)
    base.update(kw)
    return SweepConfig(**base)


def _step_inputs(mps, phi, y1h, dtype):
    B, M = phi.shape[0], mps.M
    e0 = boundary_vector(M, dtype)
    phi_t = phi.transpose(1, 0, 2)
    r_envs = right_env_stack_fused(mps.sites, phi_t, e0)
    f0 = chain_scores(jnp.broadcast_to(e0, (B, M)), mps.label_site,
                      phi[:, 0, :], r_envs[1])
    l_env = jnp.broadcast_to(e0, (B, M))
    return phi_t, r_envs, f0, l_env


@pytest.mark.parametrize("extra", [
    {},
    {"renorm_envs": True},
    {"update_mode": "normalized"},
    {"growth_cap": 0.005},
    {"step_metrics": False},
])
def test_factored_single_step_matches_xla(extra):
    """One step, identical inputs: the factored pair tensor, output, env,
    and metric scalars match the materialising path tightly (no chaos
    accumulation at a single step)."""
    mps, phi, y1h = _setup()
    M, L = mps.M, mps.L
    dtype = jnp.float32
    phi_t, r_envs, f0, l_env = _step_inputs(mps, phi, y1h, dtype)
    E2 = jnp.outer(l_env[0], l_env[0])
    lr = jnp.asarray(0.05, dtype)
    wd = jnp.asarray(1e-4, dtype)
    args = (mps.label_site, mps.sites[1], phi_t[0], phi_t[1], l_env,
            r_envs[2], E2, jnp.zeros((M, M), dtype), y1h, f0, lr, wd,
            jnp.asarray(M), mps.T)
    outs = {}
    for mode in ("off", "on"):
        A, lab, lenv, _, f_new, mets = two_site_update(
            *args, _cfg(mode, **extra)
        )
        pair = jnp.einsum("adr,rojc->adojc", A,
                          lab.transpose(0, 2, 1, 3))
        outs[mode] = (np.asarray(pair), np.asarray(f_new),
                      np.asarray(lenv), mets)
    np.testing.assert_allclose(outs["on"][0], outs["off"][0],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs["on"][1], outs["off"][1],
                               rtol=2e-5, atol=2e-5)
    # l_env is basis-dependent (gauge); compare its Gram instead
    g_on = outs["on"][2] @ outs["on"][2].T
    g_off = outs["off"][2] @ outs["off"][2].T
    np.testing.assert_allclose(g_on, g_off, rtol=1e-4, atol=1e-4)
    for k in ("accuracy", "MAE", "sum_abs_B", "sum_abs_deltaB",
              "mean_abs_f", "L2_loss", "sum_abs_L2_grad"):
        np.testing.assert_allclose(
            float(outs["on"][3][k]), float(outs["off"][3][k]),
            rtol=2e-5, atol=2e-6, err_msg=k,
        )


def test_factored_matches_explicit_oracle_f64():
    """float64, same-algorithm oracle: materialise B_new explicitly and
    run the identical sketch+Gram+iterate+R chain. The factored forms
    must agree to reassociation error (~1e-12), proving the algebra."""
    dtype = jnp.float64
    mps, phi, y1h = _setup(dtype=dtype)
    M, D, L = mps.M, mps.D, mps.L
    I, Jp = M * D, D * M
    phi_t, r_envs, f0, l_env = _step_inputs(mps, phi, y1h, dtype)
    lr = jnp.asarray(0.05, dtype)
    wd = jnp.asarray(1e-4, dtype)
    cfg = _cfg("on")

    A_f, lab_f, lenv_f, f_f, mets_f = two_site_update_factored(
        mps.label_site, mps.sites[1], phi_t[0], phi_t[1], l_env,
        r_envs[2], y1h, f0, lr, wd, mps.T, cfg,
    )

    # explicit oracle (same math, materialised)
    from tensornetworkforml_tpu.models.mps import (
        apply_act_fn,
        loss_derivative,
    )

    label3 = mps.label_site.reshape(I, L, M)
    A2m = mps.sites[1].reshape(M, Jp)
    f_act = apply_act_fn(f0, cfg.act_fn, mps.T)
    loss_der = loss_derivative(f_act, y1h, cfg.loss_fn, cfg.act_fn, mps.T)
    Lmat = jnp.einsum("ba,bi->bai", l_env, phi_t[0]).reshape(-1, I)
    rp = jnp.einsum("bj,bc->bjc", phi_t[1], r_envs[2]).reshape(-1, Jp)
    w_t = jnp.einsum("ob,bj->boj", loss_der, rp)
    B_t = jnp.einsum("iok,kj->ioj", label3, A2m)
    grad = jnp.einsum("bi,boj->ioj", Lmat, w_t)
    delta = grad - wd * B_t
    s_B, s_dB = jnp.sum(jnp.abs(B_t)), jnp.sum(jnp.abs(delta))
    gamma = jnp.where(s_dB > s_B, s_B / s_dB, 1.0)
    Bn = (B_t + lr * gamma * delta).reshape(I, L * Jp)
    G = Bn @ Bn.T
    om = _rangefinder_omega(L * Jp, M, jnp.float32).astype(dtype)
    y0 = Bn @ om
    q = _iterate_xla(y0, G, jnp.trace(G), 1e-12)
    r = q.T @ Bn
    pair_o = (q @ r).reshape(M, D, L, D, M)  # (a, d1, o, d2, c)
    pair_f = jnp.einsum("adr,rojc->adojc",
                        A_f, lab_f.transpose(0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(pair_f), np.asarray(pair_o),
                               rtol=1e-9, atol=1e-9)
    # f_new oracle: Lmat . B_new . rp
    f_oracle = jnp.einsum(
        "bi,ioj,bj->ob", Lmat, Bn.reshape(I, L, Jp), rp
    )
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_oracle),
                               rtol=1e-9, atol=1e-9)


def test_factored_sweep_quality_parity():
    """Sweep-level: chaos forbids pointwise comparison, so compare the
    TRAINING SIGNAL -- per-step accuracy/MAE series and |B|/|dB| sums
    stay within noise of the materialising path, and three sweeps land
    at the same batch accuracy."""
    mps, phi, y1h = _setup(N=12, M=8, L=3, B=32, seed=2)
    m_on = m_off = None
    out_on, out_off = mps, mps
    for _ in range(3):
        out_off, _, _, m_off = sweep_once(out_off, phi, y1h, 0.05, 1e-4,
                                          _cfg("off"))
        out_on, _, _, m_on = sweep_once(out_on, phi, y1h, 0.05, 1e-4,
                                        _cfg("on"))
    # final-sweep mean metrics agree to chaos-level tolerance
    for k, tol in (("accuracy", 0.1), ("MAE", 0.05)):
        np.testing.assert_allclose(
            float(jnp.mean(m_on[k])), float(jnp.mean(m_off[k])),
            atol=tol, err_msg=k,
        )
    # the two trained networks score the same batch equivalently
    s_on = np.asarray(mps_forward(out_on, phi))
    s_off = np.asarray(mps_forward(out_off, phi))
    acc_on = np.mean(s_on.argmax(0) == np.asarray(y1h).argmax(0))
    acc_off = np.mean(s_off.argmax(0) == np.asarray(y1h).argmax(0))
    assert abs(acc_on - acc_off) <= 0.1


def test_factored_left_factor_is_isometric_and_padding_survives():
    mps, phi, y1h = _setup(N=10, M=8)
    out, *_ = sweep_once(mps, phi, y1h, 0.05, 1e-4, _cfg("on"))
    sites = np.asarray(out.sites)
    # canonical gauge: every BULK left factor has orthonormal live
    # columns. Edge sites are rank-deficient in their rows and keep
    # near-null sketch directions -- the materialising polar path has the
    # identical property (measured iso err ~0.45-0.87 at sites 0/1/N-2
    # for BOTH engines), so bulk-only is the correct contract here.
    for l in range(2, out.N - 3):
        a = sites[l].reshape(-1, out.M)
        g = a.T @ a
        live = np.diag(g) > 1e-8
        np.testing.assert_allclose(g[np.ix_(live, live)],
                                   np.eye(live.sum()), atol=1e-4)
    # boundary padding: site 0's left bond stays the closed boundary row
    np.testing.assert_array_equal(sites[0][1:, :, :], 0.0)


def test_sketch_iterate_capture_on_gapped_spectrum():
    """The production sketch+iterate chain (sigma^1 sketch Y0 = B Om,
    full loop->power->final iterate) must capture the kept subspace of
    a realistically gapped two-site matrix: >= 1 - 1e-5 of the exact
    top-q energy across a 3-decade kept spectrum with a 0.06 gap (the
    measured training-gap floor, scripts/profile_m512.py). A gram
    sketch Y0 = G Om was measured 2.5e-4 WORSE here (f32 Gram noise
    corrupts deep directions at entry) and rejected --
    results/iterate_variants.json."""
    rng = np.random.default_rng(0)
    I, J, q = 128, 640, 64
    u, _ = np.linalg.qr(rng.standard_normal((I, I)))
    v, _ = np.linalg.qr(rng.standard_normal((J, I)))
    s = np.zeros(I)
    s[:q] = np.logspace(0, -3, q)
    s[q:] = 0.06 * s[q - 1] * np.logspace(0, -2, I - q)
    b = jnp.asarray((u * s) @ v.T, dtype=jnp.float32)
    G = b @ b.T
    om = _rangefinder_omega(J, q, jnp.float32)
    Q = _iterate_xla(b @ om, G, jnp.trace(G), 1e-6)
    cap = float(jnp.sum((Q.T @ b) ** 2)) / float(np.sum(s[:q] ** 2))
    assert cap >= 1 - 1e-5, cap


def test_factored_on_rejects_unsupported_config():
    mps, phi, y1h = _setup()
    with pytest.raises(ValueError, match="factored_update"):
        sweep_once(mps, phi, y1h, 0.05, 1e-4,
                   _cfg("on", svd_method="cholqr"))
    with pytest.raises(ValueError, match="factored_update"):
        sweep_once(mps, phi, y1h, 0.05, 1e-4, _cfg("on", L2_flag=True))


def test_auto_dispatch_is_off_at_small_bond():
    """auto only reroutes at M*D > 512; small-bond sweeps keep the
    materialising path (bitwise-identical results)."""
    mps, phi, y1h = _setup()
    out_a, _, ff_a, _ = sweep_once(mps, phi, y1h, 0.05, 1e-4, _cfg("auto"))
    out_o, _, ff_o, _ = sweep_once(mps, phi, y1h, 0.05, 1e-4, _cfg("off"))
    np.testing.assert_array_equal(np.asarray(ff_a), np.asarray(ff_o))
    np.testing.assert_array_equal(np.asarray(out_a.sites),
                                  np.asarray(out_o.sites))
