"""Teacher-MPS synthetic task: hard, capacity-sensitive, known provenance.

The round-2 review's gap: every accuracy gate ran on tasks with ceiling
1.0 (diagonals, blob-pattern synthetic MNIST), which saturate and cannot
rank recipes or trainers at fine grain. This task fixes that by sampling
labels from a RANDOM TEACHER MPS -- the standard student-teacher benchmark
shape: the function class is exactly the model class, so

* a student with enough bond dimension CAN reach the ceiling, but only by
  genuinely recovering an entangled function (random MPS scores depend on
  every site; no local feature shortcut exists);
* difficulty is tunable and honest: ``margin`` drops ambiguous samples
  near the teacher's decision boundary (keeping Bayes accuracy at 1.0
  while leaving the learning problem hard), ``teacher_m`` sets how much
  entanglement the student must represent.

No counterpart in the reference (its synthetic task is the 2-class
diagonals generator, ``data_generator.py:6-52``, solvable at M=2).
"""

from __future__ import annotations

import numpy as np


def teacher_task(
    n_train: int = 4096,
    n_test: int = 1024,
    N: int = 196,
    L: int = 10,
    teacher_m: int = 8,
    margin: float = 0.3,
    seed: int = 0,
):
    """Generate ``(train_x, train_y, test_x, test_y)`` with raw pixels in
    [0, 1] and labels from a random normalized teacher MPS.

    ``margin``: fraction of candidate samples discarded as closest to the
    teacher's decision boundary (by softmax-margin quantile); 0 keeps all.
    Samples are drawn in one batch and split deterministically, so the
    task for a given (N, L, teacher_m, seed) is reproducible everywhere.
    """
    import jax
    import jax.numpy as jnp

    from tensornetworkforml_tpu.models.mps import mps_forward, mps_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed

    rng = np.random.default_rng(seed)
    n_want = n_train + n_test
    # oversample so the margin filter + class balancing can discard
    n_cand = int(n_want / max(1e-6, 1.0 - margin) * 1.5) + L * 64

    # teacher: calibrated random MPS (output O(1) by construction)
    x_cal = rng.random((64, N))
    teacher = mps_init(
        jax.random.PRNGKey(seed + 7),
        N=N, M=teacher_m, L=L,
        normalize=True,
        calibration_phi=psi_embed(jnp.asarray(x_cal, dtype=jnp.float32)),
        act_fn="linear", loss_fn="MSE",
        dtype=jnp.float32,
    )

    xs, scores = [], []
    chunk = 2048
    for start in range(0, n_cand, chunk):
        n = min(chunk, n_cand - start)
        x = rng.random((n, N)).astype(np.float32)
        f = mps_forward(teacher, psi_embed(jnp.asarray(x)))  # (L, n)
        xs.append(x)
        scores.append(np.asarray(f).T)  # (n, L)
    x = np.concatenate(xs)
    f = np.concatenate(scores)

    # Whiten the class scores before the argmax: a random teacher's class
    # scores are ~99.6% correlated (all classes share the chain; only the
    # label leg differs), so the raw/z-scored argmax is driven by a tiny
    # structured residual and collapses onto 1-2 classes (measured: one
    # class got 6/4096 samples). Whitening the LxL covariance balances the
    # argmax -- and a linear map on the label leg is EXACTLY representable
    # by an MPS (contract it into the label core), so the labeling
    # function stays inside the teacher's function class.
    f = f - f.mean(axis=0)
    cov = np.cov(f.T) + 1e-12 * np.eye(L)
    evals, evecs = np.linalg.eigh(cov)
    white = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, 1e-12))) @ evecs.T
    f = f @ white
    y = f.argmax(axis=1)
    top2 = np.sort(f, axis=1)[:, -2:]
    marg = top2[:, 1] - top2[:, 0]
    if margin > 0:
        keep = marg >= np.quantile(marg, margin)
        x, y, marg = x[keep], y[keep], marg[keep]

    # balance classes (teacher argmax can be skewed); take the widest-
    # margin samples per class first so difficulty stays controlled
    per_class = n_want // L
    idx = []
    for c in range(L):
        cand = np.flatnonzero(y == c)
        cand = cand[np.argsort(-marg[cand])]
        if len(cand) < per_class:
            raise ValueError(
                f"class {c} has only {len(cand)} samples; lower margin or "
                "raise oversampling"
            )
        idx.append(cand[:per_class])
    idx = np.concatenate(idx)
    rng.shuffle(idx)
    x, y = x[idx], y[idx]

    return (
        x[:n_train], y[:n_train].astype(np.int64),
        x[n_train:n_train + n_test], y[n_train:n_train + n_test].astype(np.int64),
    )
