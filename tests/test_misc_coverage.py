"""Coverage for smaller API surfaces: veneer utilities, loaders,
rank-schedule edge cases, predictor from npz checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetworkforml_tpu.data.loader import ArrayLoader, NumpyDataset
from tensornetworkforml_tpu.models.mps import product_init
from tensornetworkforml_tpu.models.serving import Predictor
from tensornetworkforml_tpu.tensor import Tensor
from tensornetworkforml_tpu.train.rank_schedule import (
    fresh_bond_profile,
    reference_rank_schedule,
)
from tensornetworkforml_tpu.utils.checkpoint import save_checkpoint

RNG = np.random.default_rng(61)


def test_tensor_copy_and_inplace_ops():
    t = Tensor(elem=RNG.random((2, 3)), axes_names=["a", "b"])
    t.aggregate(axes_names=["a", "b"], new_ax_name="x")
    c = t.copy()
    assert c.aggregations == t.aggregations
    c.disaggregate("x")
    assert "x" in t.aggregations  # copy is independent

    u = Tensor(elem=RNG.random((2, 3)), axes_names=["a", "b"])
    v = Tensor(elem=RNG.random((3, 2)), axes_names=["b", "a"])
    before = np.asarray(u.elem).copy()
    u += v
    np.testing.assert_allclose(
        np.asarray(u.elem), before + np.asarray(v.elem).T, rtol=1e-12
    )
    u -= v
    np.testing.assert_allclose(np.asarray(u.elem), before, rtol=1e-10)


def test_tensor_errors():
    t = Tensor(elem=RNG.random((2, 3)), axes_names=["a", "b"])
    with pytest.raises(KeyError):
        t.ax_to_index("missing")
    with pytest.raises(ValueError):
        t.aggregate(axes_names=["a"], new_ax_name=None)
    with pytest.raises(KeyError):
        t.disaggregate("a")  # not an aggregated axis
    u = Tensor(elem=RNG.random((2, 2)), axes_names=["p", "q"])
    with pytest.raises(ValueError):
        _ = t + u


def test_array_loader_lengths_and_drop_last():
    ds = NumpyDataset(np.arange(50).reshape(25, 2), np.arange(25))
    assert len(ArrayLoader(ds, 10, drop_last=True)) == 2
    assert len(ArrayLoader(ds, 10, drop_last=False)) == 3
    # reference-style iteration yields lists of pairs
    loader = ArrayLoader(ds, 10, drop_last=False)
    chunks = list(loader)
    assert len(chunks) == 3 and len(chunks[-1]) == 5
    assert isinstance(chunks[0][0], tuple)
    # shuffle reshuffles between epochs
    sl = ArrayLoader(ds, 25, shuffle=True, seed=0)
    (x1, _), (x2, _) = next(sl.batches()), next(sl.batches())
    assert not np.array_equal(x1, x2)


def test_rank_schedule_full_profile_converges():
    """Iterating the recurrence reaches the checkpoint-observed fixed point:
    interior bonds D, edge bonds up to D*L (SURVEY.md section 6)."""
    N, M, D, L = 10, 8, 2, 2
    bonds = fresh_bond_profile(N, M)
    for i in range(6):
        left = i % 2 == 1
        _, _, bonds = reference_rank_schedule(bonds, N, D, L, left)
    assert max(bonds) <= D * L * D
    assert min(bonds) >= 1
    # interior bonds collapse to D
    assert all(b == D for b in bonds[2 : N - 3])


def test_predictor_from_npz_checkpoint(tmp_path):
    mps = product_init(jax.random.PRNGKey(0), N=16, M=4, L=3,
                       dtype=jnp.float32)
    path = os.path.join(tmp_path, "m.npz")
    save_checkpoint(mps, path)
    pred = Predictor.from_checkpoint(path, batch_size=8)
    x = RNG.random((5, 16))
    scores = pred.scores(x)
    assert scores.shape == (5, 3)
    import numpy as _np

    from tensornetworkforml_tpu.models.mps import mps_forward
    from tensornetworkforml_tpu.ops.embedding import psi_embed

    want = _np.asarray(
        mps_forward(mps, psi_embed(jnp.asarray(x, dtype=jnp.float32)))
    ).T
    _np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-6)


def test_mesh_helpers():
    import jax as _jax

    from tensornetworkforml_tpu.models.mps import product_init as _pi
    from tensornetworkforml_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicate_params,
        shard_batch,
    )

    mesh = make_mesh()
    assert mesh.devices.size == len(_jax.devices())
    with pytest.raises(ValueError):
        make_mesh(shape=(3, 5))  # does not cover the device count

    a = np.zeros((16, 4), dtype=np.float32)
    b = np.zeros((16,), dtype=np.int32)
    a_s, b_s = shard_batch(mesh, jnp.asarray(a), jnp.asarray(b))
    assert a_s.sharding.is_equivalent_to(batch_sharding(mesh, 0, 2), ndim=2)

    mps = _pi(jax.random.PRNGKey(0), N=6, M=3, L=2, dtype=jnp.float32)
    mps_r = replicate_params(mesh, mps)
    assert mps_r.sites.sharding.is_fully_replicated
