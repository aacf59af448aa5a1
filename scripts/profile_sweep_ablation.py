#!/usr/bin/env python
"""Attribute the flagship sweep's per-step time (N=196 M=128 L=10 B=256).

Round-2 bench: 46.2 ms/sweep = 237 us/step at ~2% MFU, with ~1 GFLOP of
analytic work per step (should be ~10-20 us of MXU time). Hypothesis: the
5 Cholesky + triangular-solve pairs per cholqr split dominate (sequential
panel factorizations, TPU-hostile). Ablations:

  * cholqr3 / cholqr1 / cholqr0 -- n_power sweep: slope = cost of one
    (cholqr + Gram matmul) iteration.
  * identity  -- split replaced by a no-op reshape: everything-but-split.
  * nsinv3    -- cholqr orthonormalization replaced by Y (W + eps I)^{-1/2}
    with the inverse square root from a coupled Newton-Schulz iteration:
    pure matmuls, no cholesky/solve anywhere.
  * cholqr3 @ bf16 storage -- sites/phi in bfloat16 (split upcasts to f32).
  * cholqr3 @ B=512 -- batch scaling of the gradient matmuls.

Timing discipline (CLAUDE.md): chained dispatches, host fetch at the end;
block_until_ready does not reliably block through the tunnel.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


SMOKE = bool(os.environ.get("TNML_ABL_CPU"))  # CPU logic check, tiny shapes


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import tensornetworkforml_tpu.train.sweep as sweep_mod
    from tensornetworkforml_tpu.models.mps import mps_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.ops.svd import (
        batched_cholqr_split,
        truncated_svd_split,
        _rangefinder_omega,
    )
    from tensornetworkforml_tpu.train.sweep import SweepConfig, _sweep_jit

    def nsinv_split(bmat, rank, n_power=3, ns_iters=12):
        """cholqr with the orthonormalization Y(W+eps I)^{-1/2}, W^{-1/2}
        via coupled Newton-Schulz -- matmuls only."""
        I, J = bmat.shape
        q = min(rank, I)
        eps = max(1e-5, 8.0 * q * 1.19e-7)
        ee = jnp.eye(q, dtype=bmat.dtype)

        def colnorm(y):
            n = jnp.linalg.norm(y, axis=0, keepdims=True)
            n_max = jnp.max(n)
            live = (n > 1e-6 * n_max) & jnp.isfinite(n)
            return jnp.where(live, y / jnp.maximum(n, 1e-30), 0.0)

        def orth(y):
            w = y.T @ y
            scale = jnp.max(jnp.diagonal(w))
            w = w + eps * jnp.maximum(scale, 1e-30) * ee
            # normalize spectrum into (0, 1]
            s = jnp.linalg.norm(w)  # frobenius >= sigma_max
            x = w / s
            yk = x
            zk = ee
            for _ in range(ns_iters):
                t = 1.5 * ee - 0.5 * (zk @ yk)
                yk = yk @ t
                zk = t @ zk
            w_invsqrt = zk / jnp.sqrt(s)
            return y @ w_invsqrt

        with jax.default_matmul_precision("float32"):
            bn = jnp.maximum(jnp.linalg.norm(bmat), 1e-30)
            bs = bmat / bn
            om = _rangefinder_omega(J, q, bmat.dtype)
            y = bs @ om
            g = bs @ bs.T
            for _ in range(n_power):
                y = g @ orth(colnorm(y))
            qf = orth(orth(colnorm(y)))
            return qf, qf.T @ bmat

    orig_split = truncated_svd_split

    def patched_split(bmat, rank, method="svd", keep=None, split_mode="shared"):
        if method.startswith("abl:"):
            kind = method[4:]
            if bmat.dtype == jnp.bfloat16:
                bmat = bmat.astype(jnp.float32)
            if kind == "identity":
                I, J = bmat.shape
                left = jnp.eye(I, rank, dtype=bmat.dtype)
                return left, bmat[:rank, :]
            if kind.startswith("cholqr"):
                n_power = int(kind[len("cholqr"):])
                q, r = batched_cholqr_split(bmat[None], rank, n_power=n_power)
                return q[0], r[0]
            if kind.startswith("nsinv"):
                n_power = int(kind[len("nsinv"):])
                return nsinv_split(bmat, rank, n_power=n_power)
            raise ValueError(kind)
        return orig_split(bmat, rank, method, keep=keep, split_mode=split_mode)

    sweep_mod.truncated_svd_split = patched_split

    def time_sweep(method, dtype=jnp.float32, N=196, M=128, L=10, B=256,
                   reps=8, engine="xla"):
        if SMOKE:
            N, M, B, reps = 12, 8, 16, 2
        cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                          split_mode="canonical", svd_method=method,
                          engine=engine)
        mps = mps_init(jax.random.PRNGKey(0), N=N, M=M, L=L, act_fn="linear",
                       loss_fn="MSE", dtype=dtype)
        rng = np.random.default_rng(0)
        phi = psi_embed(jnp.asarray(rng.random((B, N)), dtype=dtype))
        y = jnp.asarray(np.eye(L, dtype=np.float32)[rng.integers(0, L, B)].T,
                        dtype=dtype)
        ranks = jnp.full((N - 1,), M, dtype=jnp.int32)
        lr = jnp.asarray(0.05, dtype=dtype)
        wd = jnp.asarray(0.0, dtype=dtype)
        args = (mps.sites, mps.label_site, phi, y, lr, wd, ranks, mps.T, cfg,
                False)
        t0 = time.perf_counter()
        out = _sweep_jit(*args)
        checksum = float(jnp.sum(out[0].astype(jnp.float32)))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sites, label = mps.sites, mps.label_site
            for _ in range(reps):
                sites, label, *_ = _sweep_jit(
                    sites, label, phi, y, lr, wd, ranks, mps.T, cfg, False
                )
            _ = float(jnp.sum(sites.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / reps)
        return {"sweep_ms": round(best * 1e3, 2),
                "step_us": round(best / (N - 1) * 1e6, 1),
                "compile_s": round(compile_s, 1),
                "checksum_finite": bool(np.isfinite(checksum))}

    results = {}
    plan = [
        ("cholqr_prod", dict(method="cholqr")),  # production baseline
        ("identity", dict(method="abl:identity")),
        ("cholqr0", dict(method="abl:cholqr0")),
        ("cholqr1", dict(method="abl:cholqr1")),
        ("cholqr3", dict(method="abl:cholqr3")),
        ("nsinv3", dict(method="abl:nsinv3")),
        ("nsinv1", dict(method="abl:nsinv1")),
        ("cholqr_bf16", dict(method="cholqr", dtype=jnp.bfloat16)),
        ("cholqr_B512", dict(method="cholqr", B=512)),
        ("nsinv1_B512", dict(method="abl:nsinv1", B=512)),
        ("polar", dict(method="polar")),
        ("polar_M256", dict(method="polar", M=256)),
        ("cholqr_M256", dict(method="cholqr", M=256)),
        ("fused_step", dict(method="polar", engine="fused")),
        ("fused_step_M64", dict(method="polar", engine="fused", M=64)),
    ]
    only = os.environ.get("TNML_ABL_ONLY")
    if only:
        names = set(only.split(","))
        plan = [(n, kw) for n, kw in plan if n in names]
    for name, kw in plan:
        try:
            results[name] = time_sweep(**kw)
        except Exception as e:  # keep going; report the failure
            results[name] = {"error": repr(e)[:300]}
        print(name, "->", results[name], flush=True)

    out_path = "/root/repo/results/profile_sweep_ablation.json"
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
