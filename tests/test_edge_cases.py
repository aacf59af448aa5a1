"""Edge-case coverage: minimal chains, non-default feature dimension."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetworkforml_tpu.models.mps import mps_forward, mps_init
from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once
from tensornetworkforml_tpu.utils.checkpoint import mps_from_reference_net

RNG = np.random.default_rng(51)


def _phi(B, N, D):
    """A normalised D-dim feature map (generalised psi)."""
    x = RNG.random((B, N, D))
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.mark.parametrize("N", [2, 3])
def test_tiny_chain_works(N):
    """N=2 and N=3: the REFERENCE CRASHES on both (IndexError in its
    env-cache indexing, ``Network_class.py:632`` resp. ``:651``); the
    padded engine's boundary-vector closure handles every chain length."""
    mps = mps_init(jax.random.PRNGKey(1), N=N, M=3, L=2, normalize=True,
                   act_fn="linear", loss_fn="MSE", dtype=jnp.float64)
    B = 6
    phi = jnp.asarray(_phi(B, N, 2))
    f = mps_forward(mps, phi)
    assert f.shape == (2, B)
    y1h = jnp.zeros((2, B), dtype=jnp.float64).at[0].set(1.0)
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE")
    m = mps
    for _ in range(4):  # right and left sweeps alternate
        m, _, f_fin, _ = sweep_once(m, phi, y1h, 0.05, 0.0, cfg)
        assert bool(jnp.isfinite(f_fin).all())
    # it can actually fit the constant target
    f_final = np.asarray(mps_forward(m, phi))
    assert np.abs(f_final[0] - 1.0).mean() < np.abs(
        np.asarray(f)[0] - 1.0
    ).mean()


@pytest.mark.parametrize("N", [4])
def test_tiny_chain_sweep_parity(reference_modules, N):
    """The padded engine must match the reference at the smallest chain it
    can itself run (N=4; shorter chains crash it)."""
    tn = reference_modules["Network"]
    np.random.seed(10 + N)
    ref_net = tn.Network(N=N, M=3, D=2, L=2, act_fn="linear", loss_fn="MSE")
    # tame the raw [0,1] init so MSE gradients are sane
    for A in ref_net.As:
        A.elem = A.elem * 0.5
    mps = mps_from_reference_net(ref_net)

    B = 6
    phi = _phi(B, N, 2)
    y = RNG.integers(0, 2, B)

    f_ref = ref_net.forward(phi.copy())
    var_hist = [[], []]
    f_ref_fin = ref_net.sweep(phi.copy(), y, f_ref, 0.01, 0.1,
                              left_dir=False, var_hist=var_hist)

    cfg = SweepConfig(act_fn="linear", loss_fn="MSE",
                      rank_mode="reference")
    y1h = np.zeros((2, B))
    y1h[y, np.arange(B)] = 1.0
    mps2, f0, f_fin, metrics = sweep_once(
        mps, jnp.asarray(phi), jnp.asarray(y1h), 0.01, 0.1, cfg
    )
    np.testing.assert_allclose(
        np.asarray(f_fin), f_ref_fin.elem, rtol=1e-8, atol=1e-10
    )
    assert mps2.l_pos == ref_net.l_pos == N - 1


def test_d3_feature_map_parity(reference_modules):
    """Non-default physical dimension D=3 (e.g. RGB-channel embeddings)."""
    tn = reference_modules["Network"]
    np.random.seed(3)
    ref_net = tn.Network(N=6, M=4, D=3, L=2, act_fn="linear", loss_fn="MSE")
    for A in ref_net.As:
        A.elem = A.elem * 0.4
    mps = mps_from_reference_net(ref_net)
    assert mps.D == 3

    B = 5
    phi = _phi(B, 6, 3)
    f_ref = ref_net.forward(phi.copy())
    f_ours = mps_forward(mps, jnp.asarray(phi))
    np.testing.assert_allclose(
        np.asarray(f_ours), f_ref.elem, rtol=1e-9, atol=1e-11
    )

    y = RNG.integers(0, 2, B)
    var_hist = [[], []]
    f_ref_fin = ref_net.sweep(phi.copy(), y, f_ref, 0.02, 0.1,
                              left_dir=False, var_hist=var_hist)
    y1h = np.zeros((2, B))
    y1h[y, np.arange(B)] = 1.0
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", rank_mode="reference")
    mps2, _, f_fin, _ = sweep_once(
        mps, jnp.asarray(phi), jnp.asarray(y1h), 0.02, 0.1, cfg
    )
    np.testing.assert_allclose(
        np.asarray(f_fin), f_ref_fin.elem, rtol=1e-8, atol=1e-10
    )


def test_single_sample_batch():
    """Batch size 1 must work through init, forward, and a sweep."""
    mps = mps_init(jax.random.PRNGKey(0), N=8, M=4, L=3, normalize=True,
                   act_fn="softmax", loss_fn="cross_entropy",
                   dtype=jnp.float64)
    phi = jnp.asarray(_phi(1, 8, 2))
    f = mps_forward(mps, phi)
    assert f.shape == (3, 1)
    y1h = jnp.zeros((3, 1), dtype=jnp.float64).at[1, 0].set(1.0)
    cfg = SweepConfig(act_fn="softmax", loss_fn="cross_entropy")
    mps2, _, f_fin, _ = sweep_once(mps, phi, y1h, 0.01, 0.0, cfg)
    assert bool(jnp.isfinite(f_fin).all())
