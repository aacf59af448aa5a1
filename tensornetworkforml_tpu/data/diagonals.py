"""Synthetic noisy-diagonals dataset (the framework's fast smoke-test task).

Same distribution as the reference generator (``data_generator.py:6-52``):
each sample is one of the two diagonals of a square grayscale image mixed
with uniform noise, ``data = pattern*(1-sigma) + U[0,sigma]``; labels in
{0, 1}. The published reference model reaches ~99.5%+ validation accuracy on
this task within 5 epochs (SURVEY.md section 6), which doubles as this
repo's end-to-end training gate.
"""

from __future__ import annotations

import numpy as np


def create_dataset(
    n_samples: int,
    linear_dim: int = 5,
    sigma: float = 0.5,
    prob_zero: float = 0.5,
    seed: int | None = None,
):
    """Generate ``(data, labels)``: ``(n, dim, dim)`` floats in [0,1], ints."""
    rng = np.random.default_rng(seed)

    one = np.eye(linear_dim)
    zero = one[::-1, :]

    labels = rng.choice([0, 1], size=n_samples, p=[prob_zero, 1 - prob_zero])
    data = np.where((labels == 0)[:, None, None], zero, one)
    noise = rng.random((n_samples, linear_dim, linear_dim)) * sigma
    data = data * (1 - sigma) + noise
    return data, labels
