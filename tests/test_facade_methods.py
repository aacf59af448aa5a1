"""Parity tests for the facade's tensor_svd / compute_L2_reg vs the
reference implementations."""

import numpy as np
import pytest

from tensornetworkforml_tpu.models.network import Network
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.tensor import Tensor, contract
from tensornetworkforml_tpu.utils.checkpoint import mps_from_reference_net

RNG = np.random.default_rng(21)


def _fresh_pair(reference_modules, N=8, M=5, L=2):
    tn = reference_modules["Network"]
    np.random.seed(3)
    phi = np.asarray(psi_embed(RNG.random((8, N))))
    ref_net = tn.Network(N=N, M=M, D=2, L=L, act_fn="softmax",
                         loss_fn="cross_entropy", normalize=True,
                         calibration_X=phi)
    net = Network.__new__(Network)
    net.mps = mps_from_reference_net(ref_net)
    return ref_net, net


@pytest.mark.parametrize("l_pos,left_dir", [(2, False), (3, True)])
def test_tensor_svd_matches_reference(reference_modules, l_pos, left_dir):
    RefTensor = reference_modules["Tensor"].Tensor
    ref_net, net = _fresh_pair(reference_modules)
    ref_net.l_pos = l_pos
    net.mps = net.mps.replace(l_pos=l_pos)

    # a middle-position merged B: (left, d_a, d_b, l, right) aggregated 2-D
    M, D, L = 5, 2, 2
    elem = RNG.standard_normal((M, D, D, L, M))
    names = ["left", "da", "db", "l", "right"]

    T_ref = RefTensor(elem=elem.copy(), axes_names=list(names))
    T_ref.aggregate(axes_names=["da", "left"], new_ax_name="i")
    T_ref.aggregate(axes_names=["db", "right", "l"], new_ax_name="j")
    T_ref.transpose(["i", "j"])
    U_ref, V_ref = ref_net.tensor_svd(T_ref, left_dir=left_dir)

    T = Tensor(elem=elem.copy(), axes_names=list(names))
    T.aggregate(axes_names=["da", "left"], new_ax_name="i")
    T.aggregate(axes_names=["db", "right", "l"], new_ax_name="j")
    T.transpose(["i", "j"])
    U, V = net.tensor_svd(T, left_dir=left_dir)

    assert list(U.axes_names) == list(U_ref.axes_names)
    assert list(V.axes_names) == list(V_ref.axes_names)
    assert U.shape == tuple(U_ref.shape)
    assert V.shape == tuple(V_ref.shape)
    # factors are gauge-dependent; their product is not
    prod = contract(U, V, "right", "left")
    prod_ref = ref_net.__class__.__dict__  # noqa: F841 (doc aid)
    ref = reference_modules["linalg"].contract(U_ref, V_ref, "right", "left")
    prod.transpose([str(a) for a in ref.axes_names])
    np.testing.assert_allclose(
        np.asarray(prod.elem), ref.elem, rtol=1e-8, atol=1e-10
    )


def _mid_state_pair(reference_modules, l_pos, N=8, M=5, L=2, D=2):
    """Manufacture a mid-sweep reference state: label leg at ``l_pos``,
    ragged site shapes as the reference produces them."""
    tn = reference_modules["Network"]
    RefTensor = reference_modules["Tensor"].Tensor
    np.random.seed(4)
    ref_net = tn.Network(N=N, M=M, D=D, L=L, act_fn="softmax",
                         loss_fn="cross_entropy")
    As = []
    for n in range(N):
        names, shape = [], []
        if n > 0:
            names.append("left"); shape.append(M)
        if n < N - 1:
            names.append("right"); shape.append(M)
        names.append(f"d{n}"); shape.append(D)
        if n == l_pos:
            names.append("l"); shape.append(L)
        As.append(RefTensor(elem=RNG.standard_normal(shape) * 0.3,
                            axes_names=names))
    ref_net.As = As
    ref_net.l_pos = l_pos
    net = Network.__new__(Network)
    net.mps = mps_from_reference_net(ref_net)
    return ref_net, net


@pytest.mark.parametrize("l_pos,left_dir", [(0, False), (2, False), (4, True)])
def test_compute_L2_reg_matches_reference(reference_modules, l_pos, left_dir):
    ref_net, net = _mid_state_pair(reference_modules, l_pos)

    ldf = int(left_dir)
    B_ref = reference_modules["linalg"].contract(
        ref_net.As[l_pos - ldf], ref_net.As[l_pos + 1 - ldf], "right", "left"
    )
    loss_ref, deriv_ref = ref_net.compute_L2_reg(B_ref, 0.01, left_dir)

    # the same B through our veneer (same elements/axes)
    B = Tensor(elem=np.array(B_ref.elem), axes_names=[str(a) for a in
                                                      B_ref.axes_names])
    loss, deriv = net.compute_L2_reg(B, 0.01, left_dir)

    np.testing.assert_allclose(loss, float(loss_ref), rtol=1e-8)
    # reference renames L_2/R_2 -> right/left; compare by value with axes
    # aligned positionally (same construction order)
    assert np.asarray(deriv.elem).shape == deriv_ref.elem.shape
    np.testing.assert_allclose(
        np.asarray(deriv.elem), deriv_ref.elem, rtol=1e-8, atol=1e-10
    )
