"""Numerical parity gates vs the reference implementation and checkpoints.

These are the gates SURVEY.md section 7 calls for: load the shipped
reference checkpoints, run both forward passes on the same input, and match
to float64 precision.
"""

import numpy as np
import pytest

from tensornetworkforml_tpu.models.mps import mps_forward
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.utils.checkpoint import (
    mps_from_reference_net,
    mps_from_reference_pickle,
)
from tests.conftest import REFERENCE_DIR

RNG = np.random.default_rng(42)

DIAG_CKPT = f"{REFERENCE_DIR}/trained_diag_model.dat"
MNIST_CKPT = f"{REFERENCE_DIR}/trained_MNIST_model.dat"


def _ref_load(path, reference_modules):
    import pickle

    with open(path, "rb") as fh:
        return pickle.load(fh)


@pytest.mark.parametrize("ckpt", [DIAG_CKPT, MNIST_CKPT])
def test_forward_parity_on_reference_checkpoints(ckpt, reference_modules):
    ref_net = _ref_load(ckpt, reference_modules)
    mps = mps_from_reference_pickle(ckpt)
    assert mps.l_pos == ref_net.l_pos
    assert (mps.N, mps.M, mps.D, mps.L) == (
        ref_net.N,
        ref_net.M,
        ref_net.D,
        ref_net.L,
    )

    B = 8
    x_raw = RNG.random((B, mps.N))
    phi = np.asarray(psi_embed(x_raw))

    f_ref = ref_net.forward(phi.copy())
    f_ours = mps_forward(mps, phi)

    assert list(f_ref.axes_names) == ["l", "b"]
    np.testing.assert_allclose(
        np.asarray(f_ours), f_ref.elem, rtol=1e-10, atol=1e-12
    )


def test_forward_parity_fresh_network(reference_modules):
    """Parity on an untrained reference net (ragged shapes, l_pos=0)."""
    RefNetwork = reference_modules["Network"].Network
    np.random.seed(7)
    ref_net = RefNetwork(N=16, M=6, D=2, L=3, act_fn="softmax",
                         loss_fn="full_cross_ent")
    mps = mps_from_reference_net(ref_net)

    B = 5
    phi = np.asarray(psi_embed(RNG.random((B, 16))))
    f_ref = ref_net.forward(phi.copy())
    f_ours = mps_forward(mps, phi)
    np.testing.assert_allclose(
        np.asarray(f_ours), f_ref.elem, rtol=1e-10, atol=1e-12
    )


def test_forward_parity_label_at_right_end(reference_modules):
    """Parity with the label leg at N-1 (left-sweep entry state)."""
    ref_net = _ref_load(DIAG_CKPT, reference_modules)
    assert ref_net.l_pos == ref_net.N - 1  # the shipped diag ckpt state
    mps = mps_from_reference_pickle(DIAG_CKPT)
    phi = np.asarray(psi_embed(RNG.random((4, mps.N))))
    f_ref = ref_net.forward(phi.copy())
    f_ours = mps_forward(mps, phi)
    np.testing.assert_allclose(
        np.asarray(f_ours), f_ref.elem, rtol=1e-10, atol=1e-12
    )


def test_checkpoint_accuracy_on_diagonals(reference_modules):
    """The imported checkpoint must classify the diagonals task well."""
    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.models.mps import accuracy_from_scores
    import jax.numpy as jnp

    mps = mps_from_reference_pickle(DIAG_CKPT)
    dim = int(np.sqrt(mps.N))
    data, labels = create_dataset(512, dim, sigma=0.6, seed=3)
    phi = psi_embed(jnp.asarray(data.reshape(len(data), -1)))
    scores = mps_forward(mps, phi)
    acc = float(accuracy_from_scores(scores, jnp.asarray(labels)))
    assert acc > 0.95, f"checkpoint accuracy {acc} too low"


def test_export_to_reference_pickle_roundtrip(reference_modules, tmp_path):
    """Models exported with save_reference_pickle must load in the
    REFERENCE code and produce identical forward outputs there."""
    import pickle

    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.models.mps import mps_init
    from tensornetworkforml_tpu.utils.checkpoint import save_reference_pickle

    for l_end in (0, 15):
        mps = mps_init(jax.random.PRNGKey(7), N=16, M=5, L=3,
                       normalize=True, act_fn="softmax",
                       loss_fn="cross_entropy", dtype=jnp.float64)
        if l_end != 0:
            from tensornetworkforml_tpu.train.sweep import (
                SweepConfig,
                sweep_once,
            )

            phi_s = psi_embed(jnp.asarray(RNG.random((4, 16))))
            y1h = jnp.zeros((3, 4), dtype=jnp.float64).at[0].set(1.0)
            mps, *_ = sweep_once(
                mps, phi_s, y1h, 0.001, 0.0,
                SweepConfig(act_fn="softmax", loss_fn="cross_entropy"),
            )
            assert mps.l_pos == 15

        path = str(tmp_path / f"export_{l_end}.dat")
        save_reference_pickle(mps, path)

        with open(path, "rb") as fh:
            ref_net = pickle.load(fh)  # resolves Network_class.Network
        assert type(ref_net).__module__ == "Network_class"

        phi = np.asarray(psi_embed(RNG.random((6, 16))))
        f_ref = ref_net.forward(phi.copy())
        f_ours = mps_forward(mps, jnp.asarray(phi))
        np.testing.assert_allclose(
            np.asarray(f_ours), f_ref.elem, rtol=1e-9, atol=1e-11,
            err_msg=f"l_pos={l_end}",
        )
        # and the reference's own evaluation machinery runs on it
        acc = ref_net.accuracy(phi.copy(), np.zeros(6, dtype=int))
        assert 0.0 <= acc <= 1.0


def test_trained_model_through_reference_test_script(
    reference_modules, tmp_path
):
    """The full real-data gate (VERDICT round 1, item 8): train a model
    end-to-end HERE, export it with ``save_reference_pickle``, and evaluate
    it with the REFERENCE's own test-script machinery
    (``test_binary_MNIST.py:45-88``: per-batch ``apply_act_func(forward)``,
    ``accuracy``, MAE). The reference-side numbers must equal ours to 1e-10,
    and the trained accuracy must be high -- proving the exporter end to
    end on a model users would actually ship.
    """
    import pickle

    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.models.mps import (
        accuracy_from_scores,
        apply_act_fn,
        mps_init,
    )
    from tensornetworkforml_tpu.train.trainer import train_model
    from tensornetworkforml_tpu.utils.checkpoint import save_reference_pickle

    # train with reference semantics (shared-sqrtS split, softmax+full CE)
    data, labels = create_dataset(600, 6, sigma=0.6, seed=1)
    train_loader, val_loader, _ = prepare_dataset(
        data, labels, 0.8, 0.2, train_batch_size=32, val_batch_size=64,
        test_batch_size=64, embed=False, seed=0,
    )
    phi_cal = psi_embed(
        jnp.asarray(next(train_loader.batches())[0], dtype=jnp.float64)
    )
    mps = mps_init(
        jax.random.PRNGKey(0), N=36, M=8, L=2, normalize=True,
        calibration_phi=phi_cal, act_fn="softmax",
        loss_fn="full_cross_ent", dtype=jnp.float64,
    )
    mps, val_acc, _ = train_model(
        mps, train_loader, val_loader, lr=0.02, n_epochs=2,
        weight_dec=1.0, L2_flag=True, verbose=False,
    )
    assert val_acc[-1] >= 0.95, f"training failed: {val_acc}"

    path = str(tmp_path / "trained_export.dat")
    save_reference_pickle(mps, path)

    # --- the reference test script's evaluation, verbatim semantics ---
    with open(path, "rb") as fh:
        net = pickle.load(fh)
    test_data, test_labels = create_dataset(128, 6, sigma=0.6, seed=9)
    x = np.asarray(
        psi_embed(jnp.asarray(test_data.reshape(len(test_data), -1)))
    )
    y = np.asarray(test_labels)
    f = net.apply_act_func(net.forward(x.copy()))
    ref_acc = net.accuracy(x.copy(), y, f)
    ref_mae = np.abs(y - f.elem).mean()

    # --- ours, same inputs ---
    scores = mps_forward(mps, jnp.asarray(x))
    f_ours = apply_act_fn(scores, mps.act_fn, mps.T)
    our_acc = float(accuracy_from_scores(scores, jnp.asarray(y)))
    our_mae = float(jnp.mean(jnp.abs(jnp.asarray(y) - f_ours)))

    assert ref_acc >= 0.95
    np.testing.assert_allclose(ref_acc, our_acc, rtol=0, atol=1e-10)
    np.testing.assert_allclose(ref_mae, our_mae, rtol=1e-10)
    np.testing.assert_allclose(
        f.elem, np.asarray(f_ours), rtol=1e-9, atol=1e-12
    )
