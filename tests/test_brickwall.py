"""Brick-wall parallel-bond trainer tests: the batched layer equals a
per-pair loop, the pair gradient is the true loss gradient, the renorm is
function-preserving, and the trainer learns the diagonals task."""

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.data.diagonals import create_dataset
from tensornetworkforml_tpu.models.boundary import (
    boundary_forward,
    boundary_product_init,
)
from tensornetworkforml_tpu.models.mps import apply_act_fn, loss_derivative
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.ops.svd import _rangefinder_split
from tensornetworkforml_tpu.train.brickwall import (
    BrickConfig,
    _brick_layer,
    brick_sweep,
    train_brickwall,
)

RNG = np.random.default_rng(417)


def _naive_envs(sites, w, phi):
    """Loop-built left envs before each site (N,B,M) and labeled right
    envs after each site (N,B,M,L)."""
    N, M, D, _ = sites.shape
    B = phi.shape[0]
    L = w.shape[1]
    L_all = np.zeros((N, B, M))
    v = np.zeros((B, M))
    v[:, 0] = 1.0
    for n in range(N):
        L_all[n] = v
        v = np.einsum("bl,bd,ldr->br", v, phi[:, n], sites[n])
    R_all = np.zeros((N, B, M, L))
    R = np.broadcast_to(w, (B, M, L)).copy()
    R_all[N - 1] = R
    for n in range(N - 2, -1, -1):
        R = np.einsum("ldr,bd,bro->blo", sites[n + 1], phi[:, n + 1], R)
        R_all[n] = R
    return L_all, R_all, v


def test_brick_layer_matches_per_pair_loop():
    # N=9 covers the ragged ends: the even layer rests site 8, the odd
    # layer rests site 0
    N, M, D, L, B = 9, 4, 2, 3, 16
    key = jax.random.PRNGKey(0)
    model = boundary_product_init(key, N=N, M=M, L=L, dtype=jnp.float64,
                                  noise=0.2)
    x = RNG.random((B, N))
    phi = np.asarray(psi_embed(jnp.asarray(x)))
    y = RNG.integers(0, L, B)
    y1h = np.zeros((L, B))
    y1h[y, np.arange(B)] = 1.0

    # rangefinder split: exact per-pair match to the oracle's split calls
    cfg = BrickConfig(act_fn="linear", loss_fn="MSE", renorm=False,
                      split_method="rangefinder")
    lr, wd = 0.05, 1e-3
    w = np.asarray(model.w)

    for parity in (0, 1):
        sites = np.asarray(model.sites)
        got, metrics = _brick_layer(
            jnp.asarray(sites), jnp.asarray(w),
            jnp.asarray(phi).transpose(1, 0, 2),
            jnp.asarray(y1h), lr, wd, parity, cfg, model.T,
        )
        got = np.asarray(got)

        # oracle: explicit per-pair loop with naive environments
        L_all, R_all, l_full = _naive_envs(sites, w, phi)
        f = (l_full @ w).T
        f_act = np.asarray(apply_act_fn(jnp.asarray(f), "linear", model.T))
        loss_der = np.asarray(
            loss_derivative(jnp.asarray(f_act), jnp.asarray(y1h), "MSE",
                            "linear", model.T)
        )
        want = sites.copy()
        for p in range(parity, N - 1, 2):
            B_t = np.einsum("aim,mjc->aijc", sites[p], sites[p + 1])
            u = np.einsum("ob,bco->bc", loss_der, R_all[p + 1])
            dB = np.einsum("ba,bi,bj,bc->aijc", L_all[p], phi[:, p],
                           phi[:, p + 1], u)
            dB = dB - wd * B_t
            s_B, s_dB = np.abs(B_t).sum(), np.abs(dB).sum()
            if s_dB > s_B:
                dB = dB * (s_B / s_dB)
            B_new = B_t + lr * dB
            q, r = _rangefinder_split(
                jnp.asarray(B_new.reshape(M * D, D * M)), M,
                split_mode="canonical",
            )
            want[p] = np.asarray(q).reshape(M, D, M)
            want[p + 1] = np.asarray(r).reshape(M, D, M)

        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10,
                                   err_msg=f"parity={parity}")
        assert np.isfinite(float(metrics["accuracy"]))


def test_pair_gradient_is_autodiff_gradient():
    """The layer's pre-clip pair update direction equals minus the autodiff
    gradient of the summed MSE loss with respect to the merged pair."""
    N, M, D, L, B = 6, 3, 2, 2, 8
    model = boundary_product_init(jax.random.PRNGKey(2), N=N, M=M, L=L,
                                  dtype=jnp.float64, noise=0.3)
    x = RNG.random((B, N))
    phi = jnp.asarray(np.asarray(psi_embed(jnp.asarray(x))))
    y = RNG.integers(0, L, B)
    y1h = np.zeros((L, B))
    y1h[y, np.arange(B)] = 1.0
    y1h = jnp.asarray(y1h)
    sites, w = model.sites, model.w
    p = 2  # an interior even pair

    def loss_of_pair(B_pair):
        def fwd(b):
            v = jnp.zeros((M,), dtype=jnp.float64).at[0].set(1.0)
            for n in (0, 1):
                v = jnp.einsum("l,d,ldr->r", v, phi[b, n], sites[n])
            v = jnp.einsum("l,i,j,lijr->r", v, phi[b, p], phi[b, p + 1],
                           B_pair)
            for n in (4, 5):
                v = jnp.einsum("l,d,ldr->r", v, phi[b, n], sites[n])
            return v @ w

        f = jax.vmap(fwd)(jnp.arange(B)).T  # (L, B)
        return 0.5 * jnp.sum((y1h - f) ** 2)

    B_pair = jnp.einsum("aim,mjc->aijc", sites[p], sites[p + 1])
    auto = jax.grad(loss_of_pair)(B_pair)

    # the layer's analytic direction (MSE + linear: loss_der = y - f)
    L_all, R_all, l_full = _naive_envs(
        np.asarray(sites), np.asarray(w), np.asarray(phi)
    )
    f = (l_full @ np.asarray(w)).T
    loss_der = np.asarray(y1h) - f
    u = np.einsum("ob,bco->bc", loss_der, R_all[p + 1])
    dB = np.einsum("ba,bi,bj,bc->aijc", L_all[p], np.asarray(phi)[:, p],
                   np.asarray(phi)[:, p + 1], u)

    np.testing.assert_allclose(dB, -np.asarray(auto), rtol=1e-9, atol=1e-11)


def test_renorm_is_function_preserving():
    N, M, L, B = 10, 4, 3, 12
    model = boundary_product_init(jax.random.PRNGKey(5), N=N, M=M, L=L,
                                  dtype=jnp.float64, noise=0.2)
    x = RNG.random((B, N))
    phi = jnp.asarray(np.asarray(psi_embed(jnp.asarray(x))))
    y1h = jnp.asarray(np.eye(L)[RNG.integers(0, L, B)].T)
    phi_t = phi.transpose(1, 0, 2)

    plain, _ = _brick_layer(
        model.sites, model.w, phi_t, y1h, 0.1, 0.0, 0,
        BrickConfig(renorm=False), model.T,
    )
    renormed, _ = _brick_layer(
        model.sites, model.w, phi_t, y1h, 0.1, 0.0, 0,
        BrickConfig(renorm=True), model.T,
    )
    f_plain = boundary_forward(model.replace(sites=plain), phi)
    f_renorm = boundary_forward(model.replace(sites=renormed), phi)
    np.testing.assert_allclose(
        np.asarray(f_plain), np.asarray(f_renorm), rtol=1e-9, atol=1e-11
    )
    # the pair weight is balanced: both factors of each pair share the norm
    for p in range(0, N - 1, 2):
        np.testing.assert_allclose(
            float(jnp.linalg.norm(renormed[p])),
            float(jnp.linalg.norm(renormed[p + 1])), rtol=1e-6
        )


def test_brickwall_learns_diagonals():
    n, dim = 512, 4
    data, labels = create_dataset(n, dim, 0.5, seed=11)
    x = data.reshape(n, -1)
    model = boundary_product_init(
        jax.random.PRNGKey(3), N=dim * dim, M=8, L=2, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float64, calibration_x=x[:128],
    )

    class Loader:
        def __init__(self, x, y, b):
            self.x, self.y, self.b = x, y, b

        def batches(self):
            for i in range(len(self.x) // self.b):
                s = slice(i * self.b, (i + 1) * self.b)
                yield self.x[s], self.y[s]

    model, val_acc = train_brickwall(
        model, Loader(x[:384], labels[:384], 64),
        Loader(x[384:], labels[384:], 64), lr=0.02, n_epochs=3,
        weight_dec=1e-5,
    )  # a layer takes K clipped lr-relative pair steps: keep lr ~ O(1/K)
    assert val_acc[-1] >= 0.95, val_acc


def test_brick_epoch_equals_per_batch_loop():
    from tensornetworkforml_tpu.train.brickwall import brick_epoch

    N, M, L, B, nb = 8, 4, 3, 8, 3
    model = boundary_product_init(jax.random.PRNGKey(9), N=N, M=M, L=L,
                                  dtype=jnp.float64, noise=0.1)
    x_ep = RNG.random((nb, B, N))
    y_ep = RNG.integers(0, L, (nb, B))

    fused, metrics = brick_epoch(model, x_ep, y_ep, 0.05, 1e-4)
    assert metrics["accuracy"].shape == (nb,)

    looped = model
    cfg = BrickConfig(act_fn=model.act_fn, loss_fn=model.loss_fn)
    for i in range(nb):
        phi = psi_embed(jnp.asarray(x_ep[i]))
        y1h = jnp.asarray(np.eye(L)[y_ep[i]].T)
        looped, _ = brick_sweep(looped, phi, y1h, 0.05, 1e-4, cfg)

    np.testing.assert_allclose(
        np.asarray(fused.sites), np.asarray(looped.sites), rtol=1e-9,
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(fused.w), np.asarray(looped.w), rtol=1e-9, atol=1e-11
    )


def test_batched_cholqr_split_quality():
    """Isometry + near-optimal capture on gapped spectra (the measured
    brick regime: sigma_{M+1}/sigma_M ~ 0.004), and contraction -- not
    junk -- on rank-deficient pairs."""
    from tensornetworkforml_tpu.ops.svd import batched_cholqr_split

    K, I, J, rank = 12, 16, 16, 8
    rng = np.random.default_rng(0)
    mats = []
    for k in range(K):
        u, _ = np.linalg.qr(rng.standard_normal((I, I)))
        v, _ = np.linalg.qr(rng.standard_normal((J, J)))
        s = np.concatenate([
            np.sort(rng.random(rank))[::-1] + 1.0,
            1e-3 * rng.random(min(I, J) - rank),
        ])
        mats.append((u[:, : len(s)] * s) @ v[: len(s), :])
    mats[-1] = mats[-1][:, :].copy()
    mats[-1][:, :] = 0.0
    mats[-1][:2, :2] = np.eye(2)  # rank-2 < rank: deficient pair
    bmats = jnp.asarray(np.stack(mats))

    q, r = batched_cholqr_split(bmats, rank)
    q = np.asarray(q)
    r = np.asarray(r)

    # full-rank pairs: exact isometry and capture within 1e-6 of optimal
    for k in range(K - 1):
        np.testing.assert_allclose(
            q[k].T @ q[k], np.eye(rank), atol=1e-9
        )
        svals = np.linalg.svd(mats[k], compute_uv=False)
        opt = (svals[:rank] ** 2).sum()
        cap = ((q[k].T @ mats[k]) ** 2).sum()
        assert cap >= (1 - 1e-6) * opt, (k, cap / opt)
        # the split reproduces the pair: Q (Q^T B) ~ B up to truncation
        np.testing.assert_allclose(
            q[k] @ r[k], mats[k], atol=2e-3
        )
    # deficient pair: live directions captured, dead columns CONTRACT
    qd = q[-1]
    col_norms = np.linalg.norm(qd, axis=0)
    assert (col_norms <= 1.0 + 1e-9).all()
    cap = ((qd.T @ mats[-1]) ** 2).sum()
    assert cap >= (1 - 1e-6) * 2.0  # both live directions kept


def test_sharded_brick_step_matches_single_device():
    from tensornetworkforml_tpu.parallel.mesh import make_mesh
    from tensornetworkforml_tpu.train.brickwall import (
        make_sharded_brick_step,
    )

    N, M, L, B = 12, 4, 3, 32  # B divisible by the 8 virtual devices
    model = boundary_product_init(jax.random.PRNGKey(4), N=N, M=M, L=L,
                                  dtype=jnp.float64, noise=0.2)
    x = RNG.random((B, N))
    phi = jnp.asarray(np.asarray(psi_embed(jnp.asarray(x))))
    y1h = jnp.asarray(np.eye(L)[RNG.integers(0, L, B)].T)
    cfg = BrickConfig(act_fn=model.act_fn, loss_fn=model.loss_fn)

    single, _ = brick_sweep(model, phi, y1h, 0.05, 1e-4, cfg)

    mesh = make_mesh()  # all 8 virtual devices on the data axis
    step = make_sharded_brick_step(mesh, model.T, cfg)
    lr = jnp.asarray(0.05, jnp.float64)
    wd = jnp.asarray(1e-4, jnp.float64)
    sites_sh, w_sh, metrics = step(model.sites, model.w, phi, y1h, lr, wd)

    np.testing.assert_allclose(
        np.asarray(sites_sh), np.asarray(single.sites), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(w_sh), np.asarray(single.w), rtol=1e-9, atol=1e-11
    )
    assert np.isfinite(float(metrics["accuracy"]))


def test_grow_boundary_bond_preserves_function():
    from tensornetworkforml_tpu.models.boundary import grow_boundary_bond

    N, M, L, B = 10, 4, 3, 12
    model = boundary_product_init(jax.random.PRNGKey(6), N=N, M=M, L=L,
                                  dtype=jnp.float64, noise=0.2)
    x = RNG.random((B, N))
    phi = jnp.asarray(np.asarray(psi_embed(jnp.asarray(x))))
    before = boundary_forward(model, phi)
    grown = grow_boundary_bond(model, 7)
    assert grown.M == 7 and grown.w.shape == (7, L)
    after = boundary_forward(grown, phi)
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               rtol=1e-12, atol=1e-14)
    # growth activates: a brick sweep on the grown model trains and fills
    # new bond slots
    y1h = jnp.asarray(np.eye(L)[RNG.integers(0, L, B)].T)
    out, _ = brick_sweep(grown, phi, y1h, 0.05, 1e-5)
    assert np.isfinite(np.asarray(out.sites)).all()
    assert float(jnp.abs(out.sites[:, M:, :, :]).max()) > 0  # new slots live


def test_brickwall_checkpoint_resume(tmp_path):
    n, dim = 256, 4
    data, labels = create_dataset(n, dim, 0.5, seed=7)
    x = data.reshape(n, -1)

    class Loader:
        def __init__(self, x, y, b):
            self.x, self.y, self.b = x, y, b

        def batches(self):
            for i in range(len(self.x) // self.b):
                s = slice(i * self.b, (i + 1) * self.b)
                yield self.x[s], self.y[s]

    tl = Loader(x[:192], labels[:192], 64)
    vl = Loader(x[192:], labels[192:], 64)

    def init():
        return boundary_product_init(
            jax.random.PRNGKey(3), N=dim * dim, M=6, L=2, act_fn="linear",
            loss_fn="MSE", dtype=jnp.float64, calibration_x=x[:128],
        )

    straight, _ = train_brickwall(init(), tl, vl, lr=0.02, n_epochs=2,
                                  weight_dec=1e-5)

    ckpt = str(tmp_path / "bw.npz")
    train_brickwall(init(), tl, vl, lr=0.02, n_epochs=1, weight_dec=1e-5,
                    checkpoint_path=ckpt)
    resumed, _ = train_brickwall(init(), tl, vl, lr=0.02, n_epochs=2,
                                 weight_dec=1e-5, checkpoint_path=ckpt,
                                 resume=True)
    np.testing.assert_allclose(
        np.asarray(resumed.sites), np.asarray(straight.sites),
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(resumed.w), np.asarray(straight.w), rtol=1e-9, atol=1e-11
    )


def test_brick_sweep_shapes_and_finite():
    N, M, L, B = 9, 4, 3, 8  # odd N: trailing site rests in the even layer
    model = boundary_product_init(jax.random.PRNGKey(7), N=N, M=M, L=L,
                                  dtype=jnp.float64, noise=0.1)
    x = RNG.random((B, N))
    phi = jnp.asarray(np.asarray(psi_embed(jnp.asarray(x))))
    y1h = jnp.asarray(np.eye(L)[RNG.integers(0, L, B)].T)
    out, metrics = brick_sweep(model, phi, y1h, 0.05, 1e-4)
    assert out.sites.shape == model.sites.shape
    assert np.isfinite(np.asarray(out.sites)).all()
    assert np.isfinite(np.asarray(out.w)).all()
    assert np.isfinite(float(metrics["MAE"]))


def test_batched_cholqr_split_bfloat16_inputs():
    """bf16 inputs are factored in f32 internally (bf16 machine-eps swamps
    the Cholesky ridge) and returned in bf16."""
    from tensornetworkforml_tpu.ops.svd import batched_cholqr_split

    rng = np.random.default_rng(1)
    b32 = jnp.asarray(rng.standard_normal((4, 8, 8)), dtype=jnp.float32)
    b16 = b32.astype(jnp.bfloat16)
    q, r = batched_cholqr_split(b16, 4)
    assert q.dtype == jnp.bfloat16 and r.dtype == jnp.bfloat16
    q32, r32 = batched_cholqr_split(b32, 4)
    # reconstruction agrees with the f32 split within bf16 resolution
    np.testing.assert_allclose(
        np.einsum("kir,krj->kij", np.asarray(q, np.float32),
                  np.asarray(r, np.float32)),
        np.asarray(jnp.einsum("kir,krj->kij", q32, r32)),
        atol=0.05,
    )


def test_brick_epoch_mesh_matches_single_device():
    from tensornetworkforml_tpu.parallel.mesh import make_mesh
    from tensornetworkforml_tpu.train.brickwall import brick_epoch

    N, M, L, B, nb = 10, 4, 3, 16, 2  # B divisible by 8 devices
    model = boundary_product_init(jax.random.PRNGKey(8), N=N, M=M, L=L,
                                  dtype=jnp.float64, noise=0.1)
    x_ep = RNG.random((nb, B, N))
    y_ep = RNG.integers(0, L, (nb, B))

    single, _ = brick_epoch(model, x_ep, y_ep, 0.05, 1e-4)
    mesh = make_mesh()
    sharded, metrics = brick_epoch(model, x_ep, y_ep, 0.05, 1e-4, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sharded.sites), np.asarray(single.sites), rtol=1e-9,
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.w), np.asarray(single.w), rtol=1e-9, atol=1e-11
    )
    assert np.isfinite(np.asarray(metrics["accuracy"])).all()


def test_cholqr_wide_spectrum_contract():
    """Documents batched_cholqr_split's validity domain: kept blocks
    within ~3 decades are captured to 1e-6; a kept block spanning 5
    decades LOSES its small directions in f32 (use rangefinder/svd
    there -- the rangefinder's Rayleigh-Ritz separates directions before
    powering and keeps them)."""
    from tensornetworkforml_tpu.ops.svd import batched_cholqr_split

    def capture(dtype, decades):
        rng = np.random.default_rng(0)
        I = J = 64
        rank = 32
        u, _ = np.linalg.qr(rng.standard_normal((I, I)))
        v, _ = np.linalg.qr(rng.standard_normal((J, J)))
        s = np.concatenate([
            np.geomspace(1.0, 10.0 ** (-decades), rank),
            np.geomspace(10.0 ** (-decades - 2), 10.0 ** (-decades - 3),
                         I - rank),
        ])
        b = ((u * s) @ v).astype(np.float32)
        q, _ = batched_cholqr_split(
            jnp.asarray(b, dtype=dtype)[None], rank
        )
        q64 = np.asarray(q[0]).astype(np.float64)
        # per-direction overlap of each kept singular vector with span(Q)
        overlaps = np.linalg.norm(q64.T @ u[:, :rank], axis=0)
        return overlaps

    # narrow kept block (the measured training regime): all captured.
    # The q-scaled Cholesky ridge (8*q*machine-eps, required so q >= 256
    # splits don't NaN) costs ~1.5e-5 of per-direction overlap here --
    # far below the ~1e-2 bf16 contraction noise of the compute path.
    good = capture(jnp.float32, 2.0)
    assert good.min() > 1 - 1e-4, good.min()
    # wide kept block: small directions are lost in f32 (documented limit)
    wide = capture(jnp.float32, 5.0)
    assert wide.min() < 0.9, wide.min()  # pins the KNOWN limitation
    # ...but fine in f64 (the annihilation is a precision floor)
    wide64 = capture(jnp.float64, 5.0)
    assert wide64.min() > 1 - 1e-6, wide64.min()


def test_brick_line_search_stable_without_tuning():
    """Function-space line search (round-3): the layer chooses its own
    global step, so training is stable at a cap 100x the hand-tuned
    lr*K<=0.25 rate, with comparable quality -- the tuning knob is gone.
    gamma is recorded in the metrics and stays in (0, cap]."""
    import numpy as np

    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.models.boundary import boundary_product_init
    from tensornetworkforml_tpu.train.brickwall import (
        BrickConfig,
        brick_epoch,
    )

    data, labels = create_dataset(512, linear_dim=4, sigma=0.5, seed=0)
    tl, _, _ = prepare_dataset(
        data, labels, 1.0, 0.0, 128, 128, 128, embed=False, seed=1,
        even_train_batches=True,
    )
    x_cal, _ = next(tl.batches())
    xb, yb = [], []
    for x, y in tl.batches():
        xb.append(x)
        yb.append(y)
    xb, yb = np.stack(xb), np.stack(yb)

    model = boundary_product_init(
        jax.random.PRNGKey(0), N=16, M=8, L=2, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float32, calibration_x=x_cal,
    )
    cfg = BrickConfig(act_fn="linear", loss_fn="MSE", line_search=True)
    accs = []
    for _ in range(4):
        model, metrics = brick_epoch(model, xb, yb, 0.5, 1e-5, cfg)
        gammas = np.asarray(metrics["gamma"])
        assert np.all(gammas >= 0.0) and np.all(gammas <= 0.5)
        accs.append(float(np.mean(np.asarray(metrics["accuracy"]))))
    assert np.isfinite(np.asarray(model.sites)).all()
    assert accs[-1] >= 0.9, accs  # stable AND learning at the wild cap


def test_brick_line_search_floor_prevents_zero_step():
    """When the linearized gain <dF, loss_der> is <= 0 (e.g. a perfect fit
    where loss_der == 0 but the weight-decay direction is nonzero), the
    unfloored line search took a ZERO step, silently stalling the layer.
    The floor keeps gamma >= floor*lr so decay still applies; floor=0.0
    restores the old clamp."""
    import numpy as np

    from tensornetworkforml_tpu.models.boundary import boundary_product_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.brickwall import (
        BrickConfig,
        _brick_layer,
        _env_stacks,
        boundary_vector,
    )

    rng = np.random.default_rng(0)
    N, M, L, B = 8, 4, 2, 16
    x = rng.random((B, N)).astype(np.float32)
    model = boundary_product_init(
        jax.random.PRNGKey(0), N=N, M=M, L=L, act_fn="linear",
        loss_fn="MSE", dtype=jnp.float32, calibration_x=x,
    )
    phi_t = psi_embed(jnp.asarray(x)).transpose(1, 0, 2)
    e0 = boundary_vector(M, dtype=jnp.float32)
    _, _, l_full = _env_stacks(model.sites, model.w, phi_t, e0)
    # perfect fit: y_onehot == current scores -> loss_der == 0 -> num == 0
    y1h = (l_full @ model.w).T

    lr, wd = 0.1, 1e-3
    cfg = BrickConfig(act_fn="linear", loss_fn="MSE", line_search=True)
    _, metrics = _brick_layer(
        model.sites, model.w, phi_t, y1h, lr, wd, 0, cfg, 0.1
    )
    gam = float(metrics["gamma"])
    assert gam >= cfg.line_search_floor * lr - 1e-9, gam

    cfg0 = cfg._replace(line_search_floor=0.0)
    _, metrics0 = _brick_layer(
        model.sites, model.w, phi_t, y1h, lr, wd, 0, cfg0, 0.1
    )
    assert float(metrics0["gamma"]) <= 1e-12  # the old stall, now opt-in
