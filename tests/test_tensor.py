"""Tests for the named-axis Tensor veneer (API parity with the reference
Tensor_class / custom_linalg_tools layers)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tensornetworkforml_tpu.tensor import Tensor, contract, partial_trace

RNG = np.random.default_rng(1)


def test_init_and_names():
    t = Tensor(elem=RNG.random((2, 3, 4)), axes_names=["a", "b", "c"])
    assert t.shape == (2, 3, 4)
    assert t.rank == 3
    assert t.ax_to_index("b") == 1
    assert t.ax_to_index(["c", "a"]) == [2, 0]
    with pytest.raises(ValueError):
        Tensor(elem=RNG.random((2, 3)), axes_names=["a"])
    with pytest.raises(ValueError):
        Tensor()


def test_random_init_scale():
    t = Tensor(shape=[50, 50], axes_names=["a", "b"], scale=10.0)
    e = np.asarray(t.elem)
    assert e.min() >= 0.0 and e.max() <= 0.1


def test_transpose_by_name():
    e = RNG.random((2, 3, 4))
    t = Tensor(elem=e, axes_names=["a", "b", "c"])
    t.transpose(["c", "a", "b"])
    assert t.shape == (4, 2, 3)
    np.testing.assert_allclose(np.asarray(t.elem), e.transpose(2, 0, 1))


def test_aggregate_disaggregate_roundtrip():
    e = RNG.random((2, 3, 4, 5))
    t = Tensor(elem=e, axes_names=["a", "b", "c", "d"])
    t.aggregate(axes_names=["c", "a"], new_ax_name="x")
    assert list(t.axes_names) == ["x", "b", "d"]
    assert t.shape == (8, 3, 5)
    assert t.aggregations["x"] == {"c": 4, "a": 2}
    t.disaggregate("x")
    assert list(t.axes_names) == ["c", "a", "b", "d"]
    np.testing.assert_allclose(np.asarray(t.elem), e.transpose(2, 0, 1, 3))


def test_add_sub_align_axes():
    e1 = RNG.random((2, 3))
    e2 = RNG.random((3, 2))
    t1 = Tensor(elem=e1, axes_names=["a", "b"])
    t2 = Tensor(elem=e2, axes_names=["b", "a"])
    s = t1 + t2
    np.testing.assert_allclose(np.asarray(s.elem), e1 + e2.T)
    d = t1 - t2
    np.testing.assert_allclose(np.asarray(d.elem), e1 - e2.T)


def test_contract_single_axis():
    e1 = RNG.random((2, 3, 4))
    e2 = RNG.random((4, 5))
    t1 = Tensor(elem=e1, axes_names=["a", "b", "c"])
    t2 = Tensor(elem=e2, axes_names=["c", "e"])
    out = contract(t1, t2, contracted="c")
    assert list(out.axes_names) == ["a", "b", "e"]
    np.testing.assert_allclose(
        np.asarray(out.elem), np.einsum("abc,ce->abe", e1, e2), rtol=1e-12
    )


def test_contract_with_common_batch_axis():
    """The reference's batched pattern: contract 'right'x'left' sharing 'b'."""
    e1 = RNG.random((7, 3, 4))  # (b, l, right)
    e2 = RNG.random((7, 4, 5))  # (b, left, r2)
    t1 = Tensor(elem=e1, axes_names=["b", "l", "right"])
    t2 = Tensor(elem=e2, axes_names=["b", "left", "r2"])
    out = contract(t1, t2, "right", "left", common="b")
    assert list(out.axes_names) == ["l", "r2", "b"]
    np.testing.assert_allclose(
        np.asarray(out.elem), np.einsum("bla,bar->lrb", e1, e2), rtol=1e-12
    )


def test_contract_outer_product_with_common():
    """contracted=[] + common='b' is the phi outer product (update_B :625)."""
    e1 = RNG.random((7, 2))
    e2 = RNG.random((7, 3))
    t1 = Tensor(elem=e1, axes_names=["b", "d0"])
    t2 = Tensor(elem=e2, axes_names=["b", "d1"])
    out = contract(t1, t2, common="b")
    assert list(out.axes_names) == ["d0", "d1", "b"]
    np.testing.assert_allclose(
        np.asarray(out.elem), np.einsum("bi,bj->ijb", e1, e2), rtol=1e-12
    )


def test_contract_multi_axis_positional():
    """compute_L2_reg contracts two axes at once by position (:1027-1029)."""
    e1 = RNG.random((3, 4, 5))  # (x, right, R_2)
    e2 = RNG.random((4, 5, 6))  # (left, L_2, y)
    t1 = Tensor(elem=e1, axes_names=["x", "right", "R_2"])
    t2 = Tensor(elem=e2, axes_names=["left", "L_2", "y"])
    out = contract(
        t1, t2, t1.ax_to_index(["right", "R_2"]), t2.ax_to_index(["left", "L_2"])
    )
    assert list(out.axes_names) == ["x", "y"]
    np.testing.assert_allclose(
        np.asarray(out.elem), np.einsum("xab,aby->xy", e1, e2), rtol=1e-12
    )


def test_partial_trace():
    e = RNG.random((4, 3, 4))
    t = Tensor(elem=e, axes_names=["p", "m", "q"])
    out = partial_trace(t, "p", "q")
    assert list(out.axes_names) == ["m"]
    np.testing.assert_allclose(
        np.asarray(out.elem), np.einsum("ama->m", e), rtol=1e-12
    )


def test_contract_matches_reference(reference_modules):
    """Oracle test: our einsum contract == the reference _contract_."""
    ref = reference_modules["linalg"]
    RefTensor = reference_modules["Tensor"].Tensor

    e1 = RNG.random((6, 3, 4))
    e2 = RNG.random((6, 4, 5))
    ours = contract(
        Tensor(elem=e1, axes_names=["b", "l", "right"]),
        Tensor(elem=e2, axes_names=["b", "left", "r2"]),
        "right",
        "left",
        common="b",
    )
    theirs = ref.contract(
        RefTensor(elem=e1.copy(), axes_names=["b", "l", "right"]),
        RefTensor(elem=e2.copy(), axes_names=["b", "left", "r2"]),
        "right",
        "left",
        common="b",
    )
    assert list(ours.axes_names) == list(theirs.axes_names)
    np.testing.assert_allclose(
        np.asarray(ours.elem), theirs.elem, rtol=1e-10, atol=1e-12
    )
