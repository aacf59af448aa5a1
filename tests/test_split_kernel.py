"""Fused Pallas split kernel (ops/kernels/split_kernel.py), interpret mode.

Speed claims (TPU v5e, N=196/B=256 canonical sweeps): M=64: 134 -> 85 ms
vs the XLA rangefinder; M=128: 369 -> 307 ms (and 1038 ms for the exact
SVD). Training-quality parity gated on TPU at M=32/64 (BENCH_NOTES.md);
these CPU tests cover numerical correctness via the Pallas interpreter.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.ops.kernels.split_kernel import (
    _hqr_orth,
    rangefinder_split_pallas,
)
from tensornetworkforml_tpu.ops.svd import truncated_svd_split


def _gapped(I, J, rank, seed=0, scale=1.0, gap=0.05):
    rng = np.random.default_rng(seed)
    U = np.linalg.qr(rng.standard_normal((I, I)))[0]
    V = np.linalg.qr(rng.standard_normal((J, I)))[0]
    s = np.concatenate([
        np.geomspace(1.0, 0.1, rank),
        np.geomspace(0.1 * gap, 0.01 * gap, I - rank),
    ])
    return scale * (U * s) @ V.T


def test_hqr_orth_matches_qr():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((24, 16)), dtype=jnp.float32)
    q = np.asarray(_hqr_orth(y))
    np.testing.assert_allclose(q.T @ q, np.eye(16), atol=1e-5)
    # spans the same subspace as LAPACK QR
    q_ref = np.linalg.qr(np.asarray(y))[0]
    np.testing.assert_allclose(
        q @ (q.T @ q_ref), q_ref, atol=1e-4
    )


def test_hqr_orth_rank_deficient():
    rng = np.random.default_rng(1)
    y = np.zeros((24, 16), dtype=np.float32)
    y[:, :5] = rng.standard_normal((24, 5))
    q = np.asarray(_hqr_orth(jnp.asarray(y)))
    np.testing.assert_allclose(q.T @ q, np.eye(16), atol=1e-5)


@pytest.mark.parametrize("scale", [1.0, 1e10])
def test_split_kernel_interpret_quality(scale):
    I, J, rank = 32, 160, 16
    b = jnp.asarray(_gapped(I, J, rank, scale=scale), dtype=jnp.float32)
    q, r = rangefinder_split_pallas(b, rank, interpret=True)
    qn = np.asarray(q, dtype=np.float64)
    np.testing.assert_allclose(qn.T @ qn, np.eye(rank), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r), qn.T @ np.asarray(b), rtol=0, atol=2e-5 * scale
    )
    s = np.linalg.svd(np.asarray(b, np.float64), compute_uv=False)
    e_opt = (s[:rank] ** 2).sum()
    e_k = np.linalg.norm(qn.T @ np.asarray(b, np.float64)) ** 2
    assert e_k / e_opt > 1 - 1e-5


def test_rangefinder_pallas_method_falls_back_on_cpu():
    # on the CPU backend the method must silently use the XLA rangefinder
    b = jnp.asarray(_gapped(16, 64, 8), dtype=jnp.float64)
    q, r = truncated_svd_split(
        b, 8, "rangefinder_pallas", split_mode="canonical"
    )
    q2, r2 = truncated_svd_split(b, 8, "rangefinder", split_mode="canonical")
    np.testing.assert_allclose(np.asarray(q @ r), np.asarray(q2 @ r2),
                               atol=1e-10)


def test_rangefinder_pallas_rejects_unsupported_modes():
    b = jnp.ones((8, 16))
    with pytest.raises(ValueError, match="canonical"):
        truncated_svd_split(b, 4, "rangefinder_pallas", split_mode="shared")
    with pytest.raises(ValueError, match="reference"):
        truncated_svd_split(b, 4, "rangefinder_pallas", keep=jnp.asarray(2),
                            split_mode="canonical")


# ---------------------------------------------------------------------------
# Round-3 fused polar-NS split kernel (ops/kernels/polar_split.py)
# ---------------------------------------------------------------------------

def _gapped_matrix(I, J, rank, decay_top=2.0, gap=0.004, seed=0):
    """Synthetic two-site-like spectrum: `rank` kept directions spanning
    `decay_top` decades, then a hard gap (the measured mid-training shape:
    median sigma_{M+1}/sigma_M ~ 0.004, kept block <= ~2 decades)."""
    r = np.random.default_rng(seed)
    k = min(I, J)
    u, _ = np.linalg.qr(r.standard_normal((I, k)))
    v, _ = np.linalg.qr(r.standard_normal((J, k)))
    s = np.ones(k)
    s[:rank] = np.logspace(0, -decay_top, rank)
    s[rank:] = s[rank - 1] * gap * np.logspace(0, -2, k - rank)
    return (u * s) @ v.T


@pytest.mark.parametrize("I,J,rank", [(128, 1280, 64), (256, 2560, 128)])
def test_polar_split_quality_interpret(I, J, rank):
    """Capture and isometry at the production spectrum shape match the
    exact SVD to f32 noise (validated in interpret mode; the TPU path is
    the same kernel)."""
    from tensornetworkforml_tpu.ops.kernels.polar_split import (
        polar_split_pallas,
    )

    b = jnp.asarray(_gapped_matrix(I, J, rank), dtype=jnp.float32)
    q, r = polar_split_pallas(b, rank, interpret=True)
    q, r = np.asarray(q), np.asarray(r)
    s_true = np.linalg.svd(np.asarray(b), compute_uv=False)
    capture = (r ** 2).sum() / (s_true[:rank] ** 2).sum()
    assert capture > 1 - 1e-5
    live = np.linalg.norm(q, axis=0) > 0.5
    assert live.sum() == rank
    iso = np.abs(q[:, live].T @ q[:, live] - np.eye(rank)).max()
    assert iso < 1e-4
    # multi-chunk J tiling (J > 4096) takes the gridded accumulation path
    b2 = jnp.asarray(_gapped_matrix(128, 5120, 64), dtype=jnp.float32)
    q2, r2 = polar_split_pallas(b2, 64, interpret=True)
    rec = np.asarray(q2 @ r2)
    # Q Q^T B == Q R must reproduce the dominant part of B
    s2 = np.linalg.svd(np.asarray(b2), compute_uv=False)
    cap2 = (np.asarray(r2) ** 2).sum() / (s2[:64] ** 2).sum()
    assert cap2 > 1 - 1e-5 and np.isfinite(rec).all()


def test_polar_split_exact_zero_columns_stay_zero():
    """The padded-chain contract: exactly-zero input directions (dead bond
    slots) yield exactly-zero Q columns -- no weight leak."""
    from tensornetworkforml_tpu.ops.kernels.polar_split import (
        polar_split_pallas,
    )

    rng = np.random.default_rng(3)
    b = rng.standard_normal((64, 640)).astype(np.float32)
    b[32:, :] = 0.0  # dead rows: half the bond slots are padding
    q, r = polar_split_pallas(jnp.asarray(b), 32, interpret=True)
    q = np.asarray(q)
    # no component of any Q column may live in the dead row block
    assert np.abs(q[32:, :]).max() == 0.0
    rec_err = np.abs(np.asarray(q @ r) - b).max() / np.abs(b).max()
    assert rec_err < 1e-5


def test_polar_split_method_dispatch_and_rejections():
    from tensornetworkforml_tpu.ops.svd import truncated_svd_split as split

    b = jnp.asarray(_gapped_matrix(64, 320, 32), dtype=jnp.float32)
    q, r = split(b, 32, method="polar", split_mode="canonical")
    assert q.shape == (64, 32) and r.shape == (32, 320)
    with pytest.raises(ValueError, match="canonical"):
        split(b, 32, method="polar", split_mode="shared")
    with pytest.raises(ValueError, match="reference"):
        split(b, 32, method="polar", split_mode="canonical",
              keep=jnp.asarray(16))


def test_polar_split_sweep_trains_on_cpu():
    """End-to-end: a canonical sweep with svd_method='polar' learns the
    diagonals task (interpret-mode kernel inside the scan)."""
    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.models.mps import mps_forward, product_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.sweep import SweepConfig, train_batch

    data, labels = create_dataset(256, linear_dim=4, sigma=0.5, seed=0)
    train_loader, _, _ = prepare_dataset(
        data, labels, 1.0, 0.0, 64, 64, 64, embed=False, seed=1
    )
    x_cal, _ = next(train_loader.batches())
    mps = product_init(jax.random.PRNGKey(0), N=16, M=8, L=2,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                       calibration_x=x_cal)
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical", svd_method="polar")
    accs = []
    for _ in range(3):
        for x, y in train_loader.batches():
            mps, acc, _ = train_batch(mps, x, y, 0.1, 1e-5, cfg)
            accs.append(float(acc))
    assert np.isfinite(np.asarray(mps.sites)).all()
    assert accs[-1] >= 0.95, accs


def test_fused_step_engine_matches_xla_polar_path():
    """engine='fused' (whole-step Pallas kernel) reproduces the XLA scan
    body with svd_method='polar': identical omega/NS schedule, so network
    OUTPUTS and metric series match to f32 noise (raw site tensors are
    only gauge-equivalent -- the repo's parity convention)."""
    from tensornetworkforml_tpu.models.mps import mps_forward, product_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once

    rng = np.random.default_rng(0)
    N, M, L, B = 12, 8, 3, 16
    mps = product_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                       calibration_x=rng.random((B, N)))
    phi = psi_embed(jnp.asarray(rng.random((B, N)), dtype=jnp.float32))
    y1h = jnp.asarray(np.eye(L, dtype=np.float32)[rng.integers(0, L, B)].T)

    cfg_x = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                        split_mode="canonical", svd_method="polar")
    cfg_f = cfg_x._replace(engine="fused")
    mx, f0x, ffx, metx = sweep_once(mps, phi, y1h, 0.1, 1e-5, cfg_x)
    mf, f0f, fff, metf = sweep_once(mps, phi, y1h, 0.1, 1e-5, cfg_f)
    np.testing.assert_allclose(np.asarray(f0f), np.asarray(f0x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fff), np.asarray(ffx), atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(metf["accuracy"]), np.asarray(metx["accuracy"])
    )
    phi_p = psi_embed(jnp.asarray(rng.random((8, N)), dtype=jnp.float32))
    np.testing.assert_allclose(
        np.asarray(mps_forward(mf, phi_p)),
        np.asarray(mps_forward(mx, phi_p)),
        atol=2e-4,
    )


def test_fused_step_engine_applies_weight_decay():
    """The fused engine must apply plain weight decay exactly like the XLA
    path (dB -= wd*B BEFORE the clip, train/sweep.py:174-177). Driven at a
    LARGE wd so a silently-ignored decay is unmissable: the fused result
    must match the XLA path, and differ from a wd=0 fused run."""
    from tensornetworkforml_tpu.models.mps import mps_forward, product_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once

    rng = np.random.default_rng(3)
    N, M, L, B = 12, 8, 3, 16
    mps = product_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                       calibration_x=rng.random((B, N)))
    phi = psi_embed(jnp.asarray(rng.random((B, N)), dtype=jnp.float32))
    y1h = jnp.asarray(np.eye(L, dtype=np.float32)[rng.integers(0, L, B)].T)

    cfg_x = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                        split_mode="canonical", svd_method="polar")
    cfg_f = cfg_x._replace(engine="fused")
    wd = 0.3
    mx, _, ffx, metx = sweep_once(mps, phi, y1h, 0.1, wd, cfg_x)
    mf, _, fff, metf = sweep_once(mps, phi, y1h, 0.1, wd, cfg_f)
    mf0, _, fff0, _ = sweep_once(mps, phi, y1h, 0.1, 0.0, cfg_f)

    np.testing.assert_allclose(np.asarray(fff), np.asarray(ffx), atol=2e-4)
    # |dB| is recorded post-decay, pre-clip on both paths
    np.testing.assert_allclose(
        np.asarray(metf["mean_abs_deltaB"]),
        np.asarray(metx["mean_abs_deltaB"]), rtol=1e-3,
    )
    # and the decay actually bites: wd=0.3 differs from wd=0
    assert np.abs(np.asarray(fff) - np.asarray(fff0)).max() > 1e-3
    phi_p = psi_embed(jnp.asarray(rng.random((8, N)), dtype=jnp.float32))
    np.testing.assert_allclose(
        np.asarray(mps_forward(mf, phi_p)),
        np.asarray(mps_forward(mx, phi_p)),
        atol=2e-4,
    )


def test_fused_step_engine_trains_and_rejects_bad_configs():
    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.train.sweep import SweepConfig, train_batch

    data, labels = create_dataset(256, linear_dim=4, sigma=0.5, seed=0)
    tl, _, _ = prepare_dataset(data, labels, 1.0, 0.0, 64, 64, 64,
                               embed=False, seed=1)
    x_cal, _ = next(tl.batches())
    mps = product_init(jax.random.PRNGKey(0), N=16, M=8, L=2,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                       calibration_x=x_cal)
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical", svd_method="polar",
                      engine="fused")
    accs = []
    for _ in range(3):
        for x, y in tl.batches():
            mps, acc, _ = train_batch(mps, x, y, 0.1, 1e-5, cfg)
            accs.append(float(acc))
    assert accs[-1] >= 0.95, accs
    assert np.isfinite(np.asarray(mps.sites)).all()

    bad = cfg._replace(L2_flag=True)
    with pytest.raises(ValueError, match="fused"):
        train_batch(mps, x, y, 0.1, 1e-5, bad)


def test_polar_two_stage_matches_fused():
    """polar_split_two_stage (the I > 384 TPU dispatch, ops/svd.py) is the
    SAME math as the fused kernel split across two programs: identical
    omega and NS schedule, so Q and R agree to f32 noise."""
    from tensornetworkforml_tpu.ops.kernels.polar_split import (
        polar_split_pallas,
        polar_split_two_stage,
    )

    b = jnp.asarray(_gapped_matrix(128, 1280, 64, seed=7), dtype=jnp.float32)
    q1, r1 = polar_split_pallas(b, 64, interpret=True)
    q2, r2 = polar_split_two_stage(b, 64, interpret=True)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-4)
    # and the contract holds standalone at a two-site shape
    s_true = np.linalg.svd(np.asarray(b), compute_uv=False)
    cap = (np.asarray(r2) ** 2).sum() / (s_true[:64] ** 2).sum()
    iso = np.abs(np.asarray(q2).T @ np.asarray(q2) - np.eye(64)).max()
    assert cap > 1 - 1e-5 and iso < 1e-4


def test_gramfree_split_large_bond_contract():
    """gramfree_split (the I > 512 TPU dispatch, ops/svd.py, round 4:
    no (I, I) Gram anywhere) captures the same subspace as the fused
    polar kernel -- the BASIS differs (cholqr vs Newton-Schulz orth, pure
    gauge in canonical mode), so parity is asserted on the projector,
    the captured energy, the isometry, and the reconstruction."""
    from tensornetworkforml_tpu.ops.kernels.polar_split import (
        gramfree_split,
        polar_split_pallas,
    )

    b = jnp.asarray(_gapped_matrix(128, 1280, 64, seed=7), dtype=jnp.float32)
    qp, rp = polar_split_pallas(b, 64, interpret=True)
    qg, rg = gramfree_split(b, 64, interpret=True)
    # same projector (same captured subspace)
    proj_p = np.asarray(qp) @ np.asarray(qp).T
    proj_g = np.asarray(qg) @ np.asarray(qg).T
    np.testing.assert_allclose(proj_g, proj_p, atol=5e-4)
    # isometric up to the cholqr ridge deviation (~eps at q=64: 6e-5)
    iso = np.abs(np.asarray(qg).T @ np.asarray(qg) - np.eye(64)).max()
    assert iso < 5e-4
    # captured energy at the optimal truncation
    s_true = np.linalg.svd(np.asarray(b), compute_uv=False)
    cap = (np.asarray(rg) ** 2).sum() / (s_true[:64] ** 2).sum()
    assert cap > 1 - 1e-5
    # Q R reconstructs B to the truncation floor
    res = np.linalg.norm(np.asarray(b) - np.asarray(qg) @ np.asarray(rg))
    opt = np.sqrt((s_true[64:] ** 2).sum())
    assert res < 1.02 * opt + 1e-4

    # J-padding path (J not a multiple of the tile width)
    b_odd = jnp.asarray(
        _gapped_matrix(96, 300, 48, seed=3), dtype=jnp.float32
    )
    q3, r3 = gramfree_split(b_odd, 48, interpret=True)
    s3 = np.linalg.svd(np.asarray(b_odd), compute_uv=False)
    cap3 = (np.asarray(r3) ** 2).sum() / (s3[:48] ** 2).sum()
    assert cap3 > 1 - 1e-5
    assert np.abs(np.asarray(q3).T @ np.asarray(q3) - np.eye(48)).max() < 5e-4


def test_gramfree_split_dead_directions():
    """Rank-deficient input: the cholqr-ridge contract -- dead directions
    contracted (never junk unit columns), live block isometric, Q R == B."""
    from tensornetworkforml_tpu.ops.kernels.polar_split import gramfree_split

    rng = np.random.default_rng(11)
    true_rank = 5
    lowrank = (
        rng.standard_normal((64, true_rank))
        @ rng.standard_normal((true_rank, 256))
    )
    b = jnp.asarray(lowrank, dtype=jnp.float32)
    q, r = gramfree_split(b, 32, interpret=True)
    assert np.isfinite(np.asarray(q)).all()
    col = np.sort(np.linalg.norm(np.asarray(q), axis=0))
    assert col.max() < 1.0 + 1e-4  # never junk unit columns beyond live
    # NS-orth reconstruction carries ~1e-4 f32 roundoff (the greedy pass
    # chain's slope product amplifies rounding); far below the ~8e-3
    # bf16 contraction noise of the surrounding sweep
    np.testing.assert_allclose(
        np.asarray(q @ r), lowrank, rtol=5e-4, atol=5e-4
    )


def test_hybrid_polar_split_contract_and_dispatch():
    """hybrid_polar_split (the round-4 production TPU dispatch for
    method='polar', ops/svd.py): XLA sketch/Gram/R + the Mosaic iterate
    kernel (n2 read off tr(G)). Same omega and NS schedule as the
    all-Mosaic kernel, so Q and R agree to f32 noise; quality contract
    (capture/isometry/dead columns) holds standalone; rank > I pads Q
    with zero columns like polar_split_pallas."""
    from tensornetworkforml_tpu.ops.kernels.polar_split import (
        hybrid_polar_split,
        polar_split_pallas,
    )

    b = jnp.asarray(_gapped_matrix(128, 1280, 64, seed=11), dtype=jnp.float32)
    q1, r1 = polar_split_pallas(b, 64, interpret=True)
    q2, r2 = hybrid_polar_split(b, 64, interpret=True)
    # XLA vs in-kernel dot accumulation order differs (the all-Mosaic
    # kernel J-tiles B), and the ~19 NS passes amplify that f32 noise to
    # ~1e-4 on the factors; the quality contract below is the tight gate
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=5e-4)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-3)
    s_true = np.linalg.svd(np.asarray(b), compute_uv=False)
    cap = (np.asarray(r2) ** 2).sum() / (s_true[:64] ** 2).sum()
    iso = np.abs(np.asarray(q2).T @ np.asarray(q2) - np.eye(64)).max()
    assert cap > 1 - 1e-5 and iso < 1e-4

    # dead-direction contract: zero input rows give exactly-zero Q rows
    rng = np.random.default_rng(5)
    bd = rng.standard_normal((64, 640)).astype(np.float32)
    bd[32:, :] = 0.0
    qd, rd = hybrid_polar_split(jnp.asarray(bd), 32, interpret=True)
    assert np.abs(np.asarray(qd)[32:, :]).max() == 0.0
    rec_err = np.abs(np.asarray(qd @ rd) - bd).max() / np.abs(bd).max()
    assert rec_err < 1e-5

    # rank > I: zero-padded Q columns, R row count matches the rank
    qp, rp = hybrid_polar_split(b[:32, :128], 64, interpret=True)
    assert qp.shape == (32, 64) and rp.shape == (64, 128)
    assert np.abs(np.asarray(qp)[:, 32:]).max() == 0.0
