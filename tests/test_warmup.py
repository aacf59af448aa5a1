"""Batch-size warmup (large-batch basin fix, ROADMAP item 2).

Measured on TPU: B=256 final-val spread across 5 seeds is 0.20 without
warmup (stuck runs stay flat for 8+ epochs) and 0.037 with one half-batch
warmup epoch (mean 0.993). These tests cover the mechanics on CPU.
"""

import numpy as np

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.data.loader import (
    ArrayLoader,
    NumpyDataset,
    with_batch_size,
)
from tensornetworkforml_tpu.models.mps import mps_init
from tensornetworkforml_tpu.train.trainer import train_model


def test_with_batch_size_view():
    rng = np.random.default_rng(0)
    ds = NumpyDataset(rng.random((100, 8)), rng.integers(0, 3, 100))
    loader = ArrayLoader(ds, 32, indices=np.arange(64), shuffle=True,
                         drop_last=True, seed=0)
    half = with_batch_size(loader, 16)
    assert half.batch_size == 16
    assert len(half) == 4 and len(loader) == 2
    # same subset of the dataset
    np.testing.assert_array_equal(np.sort(half.indices),
                                  np.sort(loader.indices))
    xs = np.concatenate([x for x, _ in half.batches()])
    assert xs.shape == (64, 8)


def test_train_model_warmup_epochs():
    rng = np.random.default_rng(1)
    N, L, B = 8, 3, 16
    ds = NumpyDataset(rng.random((4 * B, N)), rng.integers(0, L, 4 * B))
    train_loader = ArrayLoader(ds, B, shuffle=True, drop_last=True, seed=0)
    val_loader = ArrayLoader(ds, B)
    mps = mps_init(jax.random.PRNGKey(0), N=N, M=4, L=L, act_fn="softmax",
                   loss_fn="cross_entropy", dtype=jnp.float32)
    _, val_acc, var_hist = train_model(
        mps, train_loader, val_loader, lr=0.05, n_epochs=2,
        warmup_epochs=1, verbose=False,
    )
    assert len(val_acc) == 2
    # warmup epoch ran at half batch -> twice the sweeps -> twice the steps
    steps0 = var_hist[0][0].shape[-1]
    steps1 = var_hist[1][0].shape[-1]
    assert steps0 == 2 * steps1


def test_warmup_default_lands_at_128():
    """The default divisor targets an ABSOLUTE warmup batch of <= 128
    (round 3: at B=1024 a half-batch warmup still fails, test 0.71 vs
    0.97 with a B=128 warmup -- results/large_batch_quality.json), while
    small batches keep the round-2 half-batch behaviour."""
    rng = np.random.default_rng(2)
    N, L, B = 6, 2, 512
    ds = NumpyDataset(rng.random((2 * B, N)), rng.integers(0, L, 2 * B))
    train_loader = ArrayLoader(ds, B, shuffle=True, drop_last=True, seed=0)
    val_loader = ArrayLoader(ds, 256)
    mps = mps_init(jax.random.PRNGKey(0), N=N, M=4, L=L, act_fn="softmax",
                   loss_fn="cross_entropy", dtype=jnp.float32)
    _, _, var_hist = train_model(
        mps, train_loader, val_loader, lr=0.05, n_epochs=2,
        warmup_epochs=1, verbose=False,
    )
    # B=512 -> divisor max(2, 512//128)=4 -> warmup batch 128 -> 4x steps
    assert var_hist[0][0].shape[-1] == 4 * var_hist[1][0].shape[-1]


def test_warmup_batch_size_formula():
    from tensornetworkforml_tpu.data.loader import warmup_batch_size

    assert warmup_batch_size(16) == 8      # small batches: half
    assert warmup_batch_size(256) == 128
    assert warmup_batch_size(512) == 128
    assert warmup_batch_size(1024) == 128
    assert warmup_batch_size(2048) == 128
    assert warmup_batch_size(1) == 1
    # ceiling divisor: batches just under a 128-multiple stay <= 128
    assert warmup_batch_size(340) == 113
    assert warmup_batch_size(300) == 100
    for b in range(1, 4097):
        w = warmup_batch_size(b)
        assert w <= 128 and w >= 1
        if b >= 2:
            assert w <= b // 2
