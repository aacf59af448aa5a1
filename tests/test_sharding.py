"""Multi-device sharding tests on the virtual 8-CPU mesh.

Checks that (a) the sharded fused train step compiles and runs over a real
``Mesh``, (b) data-parallel results are IDENTICAL to single-device results
(DP must be a pure implementation detail), (c) bond-sharded (tensor
parallel) forward matches, and (d) the chain-parallel (associative-scan)
environments match the sequential scans.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetworkforml_tpu.models.mps import mps_forward, mps_init
from tensornetworkforml_tpu.ops.contractions import (
    boundary_vector,
    left_env_stack,
    left_env_stack_parallel,
    right_env_stack,
    right_env_stack_parallel,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.parallel.dp import ShardedTrainer
from tensornetworkforml_tpu.parallel.mesh import make_mesh, site_sharding
from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once

RNG = np.random.default_rng(5)


def _make_mps(seed=0, N=16, M=6, L=2):
    phi_cal = psi_embed(jnp.asarray(RNG.random((16, N))))
    return mps_init(
        jax.random.PRNGKey(seed),
        N=N,
        M=M,
        L=L,
        normalize=True,
        calibration_phi=phi_cal,
        act_fn="softmax",
        loss_fn="full_cross_ent",
        dtype=jnp.float64,
    )


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_dp_training_step_matches_single_device():
    mps = _make_mps()
    N = mps.N
    B = 32  # divisible by 8
    x = RNG.random((B, N))
    y = RNG.integers(0, 2, B)

    # single-device path
    phi = psi_embed(jnp.asarray(x))
    y_onehot = jax.nn.one_hot(jnp.asarray(y), 2, dtype=jnp.float64).T
    cfg = SweepConfig(act_fn=mps.act_fn, loss_fn=mps.loss_fn)
    ref_mps, f0, _, _ = sweep_once(mps, phi, y_onehot, 0.01, 1.0, cfg)

    # 8-way data-parallel path
    mesh = make_mesh()
    trainer = ShardedTrainer(mesh, mps, lr=0.01, weight_dec=1.0)
    acc = trainer.step(x, y)

    np.testing.assert_allclose(
        np.asarray(trainer.mps.sites), np.asarray(ref_mps.sites),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(trainer.mps.label_site), np.asarray(ref_mps.label_site),
        rtol=1e-6, atol=1e-8,
    )
    assert trainer.mps.l_pos == ref_mps.l_pos

    # and a second (left) sweep
    x2 = RNG.random((B, N))
    y2 = RNG.integers(0, 2, B)
    phi2 = psi_embed(jnp.asarray(x2))
    y2_onehot = jax.nn.one_hot(jnp.asarray(y2), 2, dtype=jnp.float64).T
    ref_mps2, _, _, _ = sweep_once(ref_mps, phi2, y2_onehot, 0.01, 1.0, cfg)
    trainer.step(x2, y2)
    # After an SVD the raw site tensors are only gauge-stable where singular
    # values are well separated; compare the models on fresh data instead.
    phi_probe = psi_embed(jnp.asarray(RNG.random((8, N))))
    np.testing.assert_allclose(
        np.asarray(mps_forward(trainer.mps, phi_probe)),
        np.asarray(mps_forward(ref_mps2, phi_probe)),
        rtol=1e-6,
        atol=1e-8,
    )


def test_hybrid_mesh_with_bond_sharding():
    """(data=4, model=2) mesh, sites sharded on the right bond leg."""
    mps = _make_mps(N=12, M=8)
    mesh = make_mesh(shape=(4, 2))
    B = 16
    x = RNG.random((B, mps.N))
    y = RNG.integers(0, 2, B)

    phi = psi_embed(jnp.asarray(x))
    y_onehot = jax.nn.one_hot(jnp.asarray(y), 2, dtype=jnp.float64).T
    cfg = SweepConfig(act_fn=mps.act_fn, loss_fn=mps.loss_fn)
    ref_mps, _, _, _ = sweep_once(mps, phi, y_onehot, 0.01, 1.0, cfg)

    trainer = ShardedTrainer(mesh, mps, lr=0.01, weight_dec=1.0,
                             shard_bonds=True)
    trainer.step(x, y)
    np.testing.assert_allclose(
        np.asarray(trainer.mps.sites), np.asarray(ref_mps.sites),
        rtol=1e-6, atol=1e-8,
    )
    # the parameter output really is sharded over the model axis
    shards = trainer.mps.sites.sharding
    assert shards.is_equivalent_to(site_sharding(mesh), ndim=4)


def test_sharded_forward_matches():
    mps = _make_mps(N=10, M=6)
    mesh = make_mesh()
    B = 24
    phi = psi_embed(jnp.asarray(RNG.random((B, mps.N))))
    want = np.asarray(mps_forward(mps, phi))

    from tensornetworkforml_tpu.parallel.mesh import replicate_params, shard_batch

    mps_r = replicate_params(mesh, mps)
    phi_s = shard_batch(mesh, phi)
    got = np.asarray(mps_forward(mps_r, phi_s))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_chain_parallel_env_stacks_match_sequential():
    N, B, M = 9, 4, 5
    mats = jnp.asarray(RNG.standard_normal((N, B, M, M)))
    e0 = boundary_vector(M, dtype=mats.dtype)
    np.testing.assert_allclose(
        np.asarray(left_env_stack_parallel(mats, e0)),
        np.asarray(left_env_stack(mats, e0)),
        rtol=1e-9,
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(right_env_stack_parallel(mats, e0)),
        np.asarray(right_env_stack(mats, e0)),
        rtol=1e-9,
        atol=1e-11,
    )


def test_sharded_trainer_custom_cfg():
    """The CLI's canonical-recipe sharded path: custom SweepConfig."""
    mps = _make_mps(N=12, M=6, L=2)
    mps = mps.replace(sites=mps.sites.astype(jnp.float32),
                      label_site=mps.label_site.astype(jnp.float32))
    mesh = make_mesh()
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical")
    from tensornetworkforml_tpu.parallel.dp import ShardedTrainer as ST

    trainer = ST(mesh, mps, lr=0.05, weight_dec=1e-5, cfg=cfg)
    x = RNG.random((16, 12))
    y = RNG.integers(0, 2, 16)
    acc = trainer.step(x, y)
    assert 0.0 <= acc <= 1.0
    assert bool(jnp.isfinite(trainer.mps.sites).all())


def test_fused_epoch_data_parallel_matches_single_device():
    """A whole data-parallel epoch as ONE program == the unsharded epoch."""
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.train.epoch import fused_epoch

    N, M, L, nb, B = 16, 5, 3, 4, 32
    x = RNG.random((nb, B, N)).astype(np.float64)
    y = RNG.integers(0, L, (nb, B))
    mps = product_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float64,
                       calibration_x=x[0])
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical")

    m_single, accs_s, stepm_s = fused_epoch(mps, x, y, 0.05, 1e-5, cfg)
    mesh = make_mesh()
    m_dp, accs_d, stepm_d = fused_epoch(mps, x, y, 0.05, 1e-5, cfg,
                                        mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(accs_d), np.asarray(accs_s), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(stepm_d["MAE"]), np.asarray(stepm_s["MAE"]),
        rtol=1e-8, atol=1e-10,
    )
    phi = psi_embed(jnp.asarray(RNG.random((8, N))))
    np.testing.assert_allclose(
        np.asarray(mps_forward(m_dp, phi)),
        np.asarray(mps_forward(m_single, phi)),
        rtol=1e-7, atol=1e-9,
    )


def test_dp_rangefinder_split_matches_single_device():
    """The rangefinder split under GSPMD: an 8-way data-parallel sweep with
    svd_method='rangefinder' must equal the single-device result (on a
    mesh the XLA rangefinder path is used -- the fused Pallas kernel is
    single-chip only, see ops/svd._pallas_split_applicable)."""
    mps = _make_mps()
    N = mps.N
    B = 32
    x = RNG.random((B, N))
    y = RNG.integers(0, 2, B)
    cfg = SweepConfig(act_fn=mps.act_fn, loss_fn=mps.loss_fn, L2_flag=False,
                      split_mode="canonical", svd_method="rangefinder")

    phi = psi_embed(jnp.asarray(x))
    y_onehot = jax.nn.one_hot(jnp.asarray(y), 2, dtype=jnp.float64).T
    ref_mps, _, _, _ = sweep_once(mps, phi, y_onehot, 0.01, 1e-3, cfg)

    mesh = make_mesh()
    trainer = ShardedTrainer(mesh, mps, lr=0.01, weight_dec=1e-3, cfg=cfg)
    trainer.step(x, y)

    phi_probe = psi_embed(jnp.asarray(RNG.random((8, N))))
    np.testing.assert_allclose(
        np.asarray(mps_forward(trainer.mps, phi_probe)),
        np.asarray(mps_forward(ref_mps, phi_probe)),
        rtol=1e-6, atol=1e-8,
    )


def test_distributed_cholqr_split_matches_single_device():
    """Explicit-collective bond-distributed cholqr split == the
    single-device batched split (shared subspace-iteration core; only the
    psum summation order differs)."""
    from tensornetworkforml_tpu.ops.svd import batched_cholqr_split
    from tensornetworkforml_tpu.parallel.dist_split import (
        distributed_cholqr_split,
        shard_bmat_columns,
    )

    I, J, rank = 64, 384, 32
    bmat = jnp.asarray(RNG.standard_normal((I, J)))
    q_ref, r_ref = batched_cholqr_split(bmat[None], rank)

    for shape in ((1, 8), (4, 2)):
        mesh = make_mesh(shape=shape)
        b_sh = shard_bmat_columns(bmat, mesh)
        q, r = distributed_cholqr_split(b_sh, rank, mesh)
        np.testing.assert_allclose(
            np.asarray(q), np.asarray(q_ref[0]), rtol=1e-9, atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(r_ref[0]), rtol=1e-9, atol=1e-11
        )
        # the right factor really is still column-sharded over `model`
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert r.sharding.is_equivalent_to(
            NamedSharding(mesh, P(None, "model")), ndim=2
        )
        # Q is an isometry up to the documented ridge deviation
        qq = np.asarray(q.T @ q)
        assert np.abs(qq - np.eye(rank)).max() < 1e-9


def test_distributed_cholqr_split_rank_deficient():
    """Dead-direction contract survives distribution (same as the
    single-device split's documented contract): dead subspace directions
    come out CONTRACTED (|Q_col| << 1, never junk unit columns), the live
    block is isometric, and Q @ R still reproduces B."""
    from tensornetworkforml_tpu.parallel.dist_split import (
        distributed_cholqr_split,
        shard_bmat_columns,
    )

    I, J, rank, true_rank = 32, 128, 16, 5
    lowrank = (
        RNG.standard_normal((I, true_rank))
        @ RNG.standard_normal((true_rank, J))
    )
    bmat = jnp.asarray(lowrank)
    mesh = make_mesh(shape=(1, 8))
    q, r = distributed_cholqr_split(shard_bmat_columns(bmat, mesh), rank, mesh)
    col_norms = np.sort(np.linalg.norm(np.asarray(q), axis=0))
    assert (col_norms < 1e-2).sum() == rank - true_rank  # contracted
    assert np.allclose(col_norms[-true_rank:], 1.0, atol=1e-8)  # live block
    np.testing.assert_allclose(
        np.asarray(q @ r), np.asarray(bmat), rtol=1e-8, atol=1e-9
    )


def test_hybrid_mesh_bond_sharded_rangefinder():
    """Bond-TP + DP with the rangefinder split: the distributed split
    falls out of GSPMD (the Gram over the column-sharded two-site tensor
    becomes a psum; the small subspace problem is replicated)."""
    mps = _make_mps(N=12, M=8)
    mesh = make_mesh(shape=(4, 2))
    B = 16
    x = RNG.random((B, mps.N))
    y = RNG.integers(0, 2, B)
    cfg = SweepConfig(act_fn=mps.act_fn, loss_fn=mps.loss_fn, L2_flag=False,
                      split_mode="canonical", svd_method="rangefinder")

    phi = psi_embed(jnp.asarray(x))
    y_onehot = jax.nn.one_hot(jnp.asarray(y), 2, dtype=jnp.float64).T
    ref_mps, _, _, _ = sweep_once(mps, phi, y_onehot, 0.01, 1e-3, cfg)

    trainer = ShardedTrainer(mesh, mps, lr=0.01, weight_dec=1e-3,
                             shard_bonds=True, cfg=cfg)
    trainer.step(x, y)
    phi_probe = psi_embed(jnp.asarray(RNG.random((8, mps.N))))
    np.testing.assert_allclose(
        np.asarray(mps_forward(trainer.mps, phi_probe)),
        np.asarray(mps_forward(ref_mps, phi_probe)),
        rtol=1e-6, atol=1e-8,
    )
    assert trainer.mps.sites.sharding.is_equivalent_to(
        site_sharding(mesh), ndim=4
    )


def test_distributed_polar_split_matches_fused_kernel():
    """Pallas x GSPMD (round-3): the two-stage polar kernels composed with
    shard_map + psum equal the fused single-device kernel (identical math;
    only the psum summation order differs)."""
    from tensornetworkforml_tpu.ops.kernels.polar_split import (
        polar_split_pallas,
    )
    from tensornetworkforml_tpu.parallel.dist_split import (
        distributed_polar_split,
        shard_bmat_columns,
    )

    I, J, rank = 64, 512, 32
    bmat = jnp.asarray(
        RNG.standard_normal((I, J)), dtype=jnp.float32
    )
    q_ref, r_ref = polar_split_pallas(bmat, rank, interpret=True)

    mesh = make_mesh(shape=(1, 8))
    q, r = distributed_polar_split(shard_bmat_columns(bmat, mesh), rank, mesh)
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(q_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r), np.asarray(r_ref), rtol=1e-4, atol=1e-4
    )
    qq = np.asarray(q).T @ np.asarray(q)
    assert np.abs(qq - np.eye(rank)).max() < 1e-3


def test_predictor_pallas_under_mesh_matches_xla():
    """The fused serving kernel runs batch-sharded over the mesh via
    shard_map (round-2 flagged it single-chip-only) and matches the XLA
    scores."""
    from tensornetworkforml_tpu.models.serving import Predictor

    mps = _make_mps(N=10, M=6)
    mps32 = mps.replace(sites=mps.sites.astype(jnp.float32),
                        label_site=mps.label_site.astype(jnp.float32))
    mesh = make_mesh()
    x = RNG.random((32, mps.N)).astype(np.float32)

    p_xla = Predictor(mps32, batch_size=32)
    p_mesh = Predictor(mps32, batch_size=32, mesh=mesh, use_pallas=True)
    assert p_mesh.use_pallas is True
    np.testing.assert_allclose(
        p_mesh.scores(x), p_xla.scores(x), rtol=2e-4, atol=2e-5,
    )


def test_dist_split_trainer_routes_and_matches(monkeypatch):
    """VERDICT-r3 #4: bond-distributed splits must be reachable from a
    TRAINER, not just as primitives. ``ShardedTrainer(dist_split='cholqr')``
    (a) really routes every sweep split through ``parallel/dist_split.py``
    (asserted by patching the module attribute the scan body resolves at
    trace time), (b) keeps the right factor column-sharded over ``model``
    inside the compiled step (``inspect_array_sharding``), and (c) trains
    the same network as the single-program cholqr sweep."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import tensornetworkforml_tpu.parallel.dist_split as ds

    mps = _make_mps(N=12, M=8)
    B = 16
    x = RNG.random((B, mps.N))
    y = RNG.integers(0, 2, B)
    cfg = SweepConfig(act_fn=mps.act_fn, loss_fn=mps.loss_fn, L2_flag=False,
                      split_mode="canonical", svd_method="cholqr")

    phi = psi_embed(jnp.asarray(x))
    y_onehot = jax.nn.one_hot(jnp.asarray(y), 2, dtype=jnp.float64).T
    ref_mps, _, _, _ = sweep_once(mps, phi, y_onehot, 0.01, 1e-3, cfg)

    calls = []
    shardings = []
    real = ds.distributed_cholqr_split

    def spy(bmat, rank, mesh, *a, **k):
        calls.append(bmat.shape)
        q, r = real(bmat, rank, mesh, *a, **k)
        jax.debug.inspect_array_sharding(
            r, callback=shardings.append
        )
        return q, r

    monkeypatch.setattr(ds, "distributed_cholqr_split", spy)

    mesh = make_mesh(shape=(4, 2))
    trainer = ShardedTrainer(mesh, mps, lr=0.01, weight_dec=1e-3, cfg=cfg,
                             dist_split="cholqr")
    assert trainer.cfg.dist_split == "cholqr"
    assert trainer.cfg.dist_mesh is mesh
    trainer.step(x, y)

    assert len(calls) >= 1  # the scan body traced through the dist path
    assert calls[0] == (mps.M * 2, 2 * 2 * mps.M)  # (M*D, L*D*M)
    want = NamedSharding(mesh, P(None, "model"))
    assert shardings and all(
        s.is_equivalent_to(want, ndim=2) for s in shardings
    )

    phi_probe = psi_embed(jnp.asarray(RNG.random((8, mps.N))))
    np.testing.assert_allclose(
        np.asarray(mps_forward(trainer.mps, phi_probe)),
        np.asarray(mps_forward(ref_mps, phi_probe)),
        rtol=1e-6, atol=1e-8,
    )


def test_dist_split_trainer_m512():
    """Bond-parallel TRAINING at large M (VERDICT-r3 #4 done-criterion):
    one sweep step at M=512 on a pure model mesh, every split running the
    explicit-collective cholqr with J = L*D*M = 2048 columns sharded 8
    ways (256 per device)."""
    from tensornetworkforml_tpu.models.mps import product_init

    N, M, L, B = 6, 512, 2, 16
    mps = product_init(
        jax.random.PRNGKey(0), N=N, M=M, L=L, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float32,
        calibration_x=RNG.random((16, N)),
    )
    mesh = make_mesh(shape=(1, 8))
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical")
    trainer = ShardedTrainer(mesh, mps, lr=0.01, weight_dec=1e-5, cfg=cfg,
                             dist_split="cholqr")
    acc = trainer.step(RNG.random((B, N)), RNG.integers(0, L, B))
    assert 0.0 <= acc <= 1.0
    assert bool(jnp.isfinite(trainer.mps.sites).all())
    assert bool(jnp.isfinite(trainer.mps.label_site).all())
    assert trainer.mps.l_pos == N - 1


def test_dist_split_trainer_polar():
    """The Pallas polar variant routed from the trainer (interpret mode on
    the CPU mesh): finite step, left sweep included."""
    from tensornetworkforml_tpu.models.mps import product_init

    N, M, L, B = 8, 32, 2, 16
    mps = product_init(
        jax.random.PRNGKey(1), N=N, M=M, L=L, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float32,
        calibration_x=RNG.random((16, N)),
    )
    mesh = make_mesh(shape=(1, 8))
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical")
    trainer = ShardedTrainer(mesh, mps, lr=0.01, weight_dec=1e-5, cfg=cfg,
                             dist_split="polar")
    trainer.step(RNG.random((B, N)), RNG.integers(0, L, B))
    trainer.step(RNG.random((B, N)), RNG.integers(0, L, B))  # mirrored sweep
    assert bool(jnp.isfinite(trainer.mps.sites).all())
    assert trainer.mps.l_pos == 0


def test_dist_split_requires_canonical_and_mesh():
    from tensornetworkforml_tpu.train.sweep import two_site_update

    mps = _make_mps(N=8, M=4)
    with pytest.raises(ValueError, match="canonical"):
        cfg = SweepConfig(L2_flag=False, split_mode="shared",
                          dist_split="cholqr", dist_mesh=make_mesh())
        phi = psi_embed(jnp.asarray(RNG.random((4, mps.N))))
        y1h = jax.nn.one_hot(jnp.asarray([0, 1, 0, 1]), 2,
                             dtype=jnp.float64).T
        sweep_once(mps, phi, y1h, 0.01, 1e-3, cfg)
    with pytest.raises(ValueError, match="dist_mesh"):
        cfg = SweepConfig(L2_flag=False, split_mode="canonical",
                          dist_split="cholqr")
        phi = psi_embed(jnp.asarray(RNG.random((4, mps.N))))
        y1h = jax.nn.one_hot(jnp.asarray([0, 1, 0, 1]), 2,
                             dtype=jnp.float64).T
        sweep_once(mps, phi, y1h, 0.01, 1e-3, cfg)
