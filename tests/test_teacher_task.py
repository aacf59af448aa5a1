"""Teacher-MPS synthetic task (data/teacher.py): balance, determinism,
and capacity-sensitivity at smoke scale."""

import numpy as np

import tests.conftest  # noqa: F401  (forces the CPU backend before jax)
import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.data.teacher import teacher_task


def test_teacher_task_balanced_and_deterministic():
    a = teacher_task(n_train=400, n_test=100, N=16, L=4, teacher_m=3,
                     margin=0.3, seed=5)
    b = teacher_task(n_train=400, n_test=100, N=16, L=4, teacher_m=3,
                     margin=0.3, seed=5)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    tr_x, tr_y, te_x, te_y = a
    assert tr_x.shape == (400, 16) and te_x.shape == (100, 16)
    assert 0.0 <= tr_x.min() and tr_x.max() <= 1.0
    total = np.bincount(np.concatenate([tr_y, te_y]), minlength=4)
    assert total.min() == total.max() == 125  # exact balance overall
    counts = np.bincount(tr_y, minlength=4)
    assert counts.min() >= 80  # train split stays near-balanced
    # different seed -> different task
    c = teacher_task(n_train=400, n_test=100, N=16, L=4, teacher_m=3,
                     margin=0.3, seed=6)
    assert not np.array_equal(a[0], c[0])


def test_teacher_task_is_learnable_but_not_saturating():
    """A student with enough bond dimension learns well above chance but
    the task does not saturate at 1.0 (the round-2 gap: every prior
    synthetic task had ceiling 1.0 and could not rank recipes)."""
    from tensornetworkforml_tpu.data.loader import prepare_dataset
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.train.trainer import (
        evaluate_accuracy,
        train_model,
    )

    tr_x, tr_y, te_x, te_y = teacher_task(
        n_train=768, n_test=256, N=24, L=3, teacher_m=2, margin=0.5, seed=0
    )
    data = np.concatenate([tr_x, te_x])
    labels = np.concatenate([tr_y, te_y])
    tl, _, test_l = prepare_dataset(
        data, labels, 0.75, 0.0, 128, 128, 256, embed=False, seed=1,
        even_train_batches=True,
    )
    x_cal, _ = next(tl.batches())
    mps = product_init(jax.random.PRNGKey(0), N=24, M=8, L=3,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32,
                       calibration_x=x_cal)
    mps, _, _ = train_model(mps, tl, tl, lr=0.1, n_epochs=6,
                            weight_dec=1e-5, L2_flag=False,
                            split_mode="canonical", svd_method="cholqr",
                            verbose=False)
    test = evaluate_accuracy(mps, test_l)
    assert test > 0.6  # far above the 1/3 chance level
