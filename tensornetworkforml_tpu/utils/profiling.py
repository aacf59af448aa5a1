"""Profiling / tracing utilities.

The reference's only profiling is hand-rolled ``time.time()`` harnesses in
its development notebooks (``old_files/tn_develpment.ipynb`` cells 18-50,
SURVEY.md section 5), which produced the per-op baselines in BASELINE.md.
This module provides the equivalent as a library:

* ``Timer`` / ``timed``: accumulating wall-clock scopes (device-synced);
* ``profile_model``: the notebook's table -- per-op timings for forward,
  full sweep, env scans, and the SVD split -- for any model configuration;
* ``device_trace``: a context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the real device timeline.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np


def _device_sync(tree):
    """Force execution of everything ``tree`` depends on.

    ``jax.block_until_ready`` alone is not trustworthy through the axon
    TPU tunnel (it can return once dispatches are merely QUEUED — measured
    0.1 ms "waits" on chains of 18 ms sweeps); a host FETCH of one element
    is the only proof of execution, so do both.
    """
    jax.block_until_ready(tree)
    # fetch from EVERY leaf: independent dispatches complete independently,
    # so proving one program says nothing about the others
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])


class Timer:
    """Accumulating named wall-clock scopes with device synchronisation."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                _device_sync(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(1, self.counts[name]),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = [f"{'op':<28}{'count':>8}{'mean ms':>12}{'total s':>12}"]
        for name, s in sorted(
            self.summary().items(), key=lambda kv: -kv[1]["total_s"]
        ):
            lines.append(
                f"{name:<28}{s['count']:>8}{s['mean_ms']:>12.3f}"
                f"{s['total_s']:>12.3f}"
            )
        return "\n".join(lines)


def profile_model(
    N: int = 25,
    M: int = 20,
    L: int = 2,
    batch: int = 16,
    iters: int = 10,
    dtype=None,
    seed: int = 0,
) -> Dict[str, Dict[str, float]]:
    """Per-op timing table for a model configuration (the reference
    notebook's profiling harness, reproducible from the library).

    Times (device-synced, post-compile): full forward, one full sweep,
    env-stack build, and one SVD split at the sweep's matrix shape.
    """
    import jax.numpy as jnp

    from tensornetworkforml_tpu.models.mps import mps_init, mps_forward
    from tensornetworkforml_tpu.ops.contractions import (
        boundary_vector,
        right_env_stack_fused,
    )
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.ops.svd import truncated_svd_split
    from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once

    if dtype is None:
        dtype = jnp.float32
    rng = np.random.default_rng(seed)
    mps = mps_init(
        jax.random.PRNGKey(seed), N=N, M=M, L=L, normalize=True,
        act_fn="softmax", loss_fn="full_cross_ent", dtype=dtype,
    )
    x = jnp.asarray(rng.random((batch, N)), dtype=dtype)
    phi = psi_embed(x)
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, L, batch)), L, dtype=dtype).T
    cfg = SweepConfig(act_fn="softmax", loss_fn="full_cross_ent")
    e0 = boundary_vector(M, dtype=dtype)
    phi_t = phi.transpose(1, 0, 2)
    bmat = jnp.asarray(rng.standard_normal((M * 2, L * 2 * M)), dtype=dtype)

    # warm-up compilations (fetch-synced: see _device_sync)
    _device_sync(mps_forward(mps, phi))
    m2, *_ = sweep_once(mps, phi, y, 0.01, 1.0, cfg)
    m3, *_ = sweep_once(m2, phi, y, 0.01, 1.0, cfg)
    _device_sync(m3.sites)
    _device_sync(right_env_stack_fused(mps.sites, phi_t, e0))
    _device_sync(truncated_svd_split(bmat, M))

    timer = Timer()
    for _ in range(iters):
        with timer.scope("forward"):
            out = mps_forward(mps, phi)
            _device_sync(out)
        with timer.scope("full_sweep"):
            m2, *_ = sweep_once(mps, phi, y, 0.01, 1.0, cfg)
            _device_sync(m2.sites)
        with timer.scope("env_stack"):
            envs = right_env_stack_fused(mps.sites, phi_t, e0)
            _device_sync(envs)
        with timer.scope("svd_split"):
            u, v = truncated_svd_split(bmat, M)
            _device_sync(v)
    return timer.summary()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
