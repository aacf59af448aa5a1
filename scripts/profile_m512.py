#!/usr/bin/env python
"""Round-5 measurement session: attribute the M=512 step time and A/B the
gramfree-split changes (precision + light orth), plus the flagship
step_metrics ablation and the serving XLA-vs-Pallas re-measurement
(VERDICT r4 items 1-3).

Workloads:
  * standalone split on (I=1024, J=10240) -- the stretch config's
    two-site matrix (N=196, M=512, L=10), realistic gapped spectrum;
    reports ms + isometry + capture vs the exact top-rank energy.
  * in-sweep N=196 M=512 B=256 with polar (new defaults), the round-4
    gramfree behavior (monkeypatched), and an identity split
    (everything-but-split attribution at M=512).
  * flagship N=196 M=128 polar with step_metrics on/off.
  * serving forward XLA vs Pallas at B in {256, 2048} (VERDICT item 2).

Timing discipline (CLAUDE.md): chained/looped dispatches, host fetch at
the end; block_until_ready does not reliably block through the tunnel.
Results merge incrementally into results/m512_profile.json so a tunnel
drop keeps earlier numbers.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "/root/repo/results/m512_profile.json"
SMOKE = bool(os.environ.get("TNML_M512_CPU"))


def save(name, val):
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged[name] = val
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print(name, "->", val, flush=True)


def gapped_bmat(I=1024, J=10240, rank=512, seed=0):
    """Realistic two-site matrix: 3-decade kept spectrum, hard gap at the
    bond dimension (ratio 0.06, the measured training-gap floor), noise
    tail; a few dead rows/cols mimic the padded edge structure."""
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((I, I)))
    v, _ = np.linalg.qr(rng.standard_normal((J, I)))
    s = np.zeros(I)
    s[:rank] = np.logspace(0, -3, rank)
    s[rank:] = 0.06 * s[rank - 1] * np.logspace(0, -2, I - rank)
    b = (u * s) @ v.T
    return b.astype(np.float32), s


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tensornetworkforml_tpu.ops.kernels.polar_split import gramfree_split

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu

    only = os.environ.get("TNML_M512_ONLY")
    only = set(only.split(",")) if only else None

    def want(name):
        return only is None or name in only

    # ---- standalone split variants --------------------------------------
    I, J, rank = (256, 1280, 128) if SMOKE else (1024, 10240, 512)
    b_np, s_exact = gapped_bmat(I, J, rank)
    top_energy = float(np.sum(s_exact[:rank] ** 2))
    b_dev = jnp.asarray(b_np)

    def split_point(name, reps=20, **kw):
        if not want(name):
            return
        t0 = time.perf_counter()
        q, r = gramfree_split(b_dev, rank, interpret=interp, **kw)
        qh = np.asarray(q)
        compile_s = time.perf_counter() - t0
        # quality on the compiled artifact
        iso = float(np.abs(qh.T @ qh - np.eye(rank)).max())
        capture = float(np.sum(np.asarray(r).astype(np.float64) ** 2))
        capture /= top_energy

        # pipelined timing: loop inside jit, perturb input to defeat CSE
        @jax.jit
        def looped(b):
            def body(i, carry):
                b_c, acc = carry
                q, r = gramfree_split(b_c, rank, interpret=interp, **kw)
                m = jnp.sum(q[0]) * 1e-20
                return (b_c + m, acc + jnp.sum(r[0, 0]))

            return jax.lax.fori_loop(0, reps, body, (b, jnp.float32(0)))[1]

        _ = float(looped(b_dev))  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(looped(b_dev))
            best = min(best, (time.perf_counter() - t0) / reps)
        save(name, {
            "ms": round(best * 1e3, 3), "iso": f"{iso:.2e}",
            "capture": round(capture, 8), "compile_s": round(compile_s, 1),
        })

    split_point("gf_r4", precision="highest", orth="cholqr")
    split_point("gf_prec", precision="default", orth="cholqr")
    split_point("gf_ns", precision="default", orth="ns")
    split_point("gf_ns_hi", precision="highest", orth="ns")

    # ---- cholesky/orth cost probe ---------------------------------------
    if want("chol_pair"):
        y_np = np.asarray(
            np.random.default_rng(1).standard_normal((I, rank)), np.float32
        )
        y_dev = jnp.asarray(y_np)
        ee = jnp.eye(rank, dtype=jnp.float32)

        @jax.jit
        def chol_loop(y):
            def body(i, carry):
                y_c, acc = carry
                with jax.default_matmul_precision("float32"):
                    w = y_c.T @ y_c
                    c = jnp.linalg.cholesky(w + 1e-4 * ee)
                    q = jax.lax.linalg.triangular_solve(
                        c, y_c, left_side=False, lower=True, transpose_a=True
                    )
                return (y_c + 1e-20 * jnp.sum(q[0]), acc + jnp.sum(q[0, 0]))

            return jax.lax.fori_loop(0, 40, body, (y, jnp.float32(0)))[1]

        _ = float(chol_loop(y_dev))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chol_loop(y_dev))
            best = min(best, (time.perf_counter() - t0) / 40)
        save("chol_pair", {"us": round(best * 1e6, 1),
                           "shape": f"({I},{rank})"})

    # ---- in-sweep M=512 -------------------------------------------------
    import tensornetworkforml_tpu.train.sweep as sweep_mod
    from tensornetworkforml_tpu.models.mps import mps_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.ops.svd import truncated_svd_split
    from tensornetworkforml_tpu.train.sweep import SweepConfig, _sweep_jit

    orig_split = truncated_svd_split

    def patched_split(bmat, rank, method="svd", keep=None,
                      split_mode="shared", **kw):
        if method.startswith("abl:"):
            kind = method[4:]
            if bmat.dtype == jnp.bfloat16:
                bmat = bmat.astype(jnp.float32)
            if kind == "identity":
                Ii, Jj = bmat.shape
                return (jnp.eye(Ii, rank, dtype=bmat.dtype),
                        bmat[:rank, :])
            if kind == "gf_old":
                return gramfree_split(bmat, rank, interpret=interp,
                                      precision="highest", orth="cholqr")
            raise ValueError(kind)
        return orig_split(bmat, rank, method, keep=keep,
                          split_mode=split_mode, **kw)

    sweep_mod.truncated_svd_split = patched_split

    def time_sweep(name, method, N=196, M=512, L=10, B=256, reps=4,
                   step_metrics=True, engine="xla"):
        if not want(name):
            return
        if SMOKE:
            N, M, B, reps = 12, 8, 16, 2
        cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                          split_mode="canonical", svd_method=method,
                          step_metrics=step_metrics, engine=engine)
        mps = mps_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32)
        rng = np.random.default_rng(0)
        phi = psi_embed(jnp.asarray(rng.random((B, N)), dtype=jnp.float32))
        y = jnp.asarray(np.eye(L, dtype=np.float32)[rng.integers(0, L, B)].T)
        ranks = jnp.full((N - 1,), M, dtype=jnp.int32)
        lr = jnp.asarray(0.05, jnp.float32)
        wd = jnp.asarray(0.0, jnp.float32)
        t0 = time.perf_counter()
        out = _sweep_jit(mps.sites, mps.label_site, phi, y, lr, wd, ranks,
                         mps.T, cfg, False)
        checksum = float(jnp.sum(out[0]))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sites, label = mps.sites, mps.label_site
            for _ in range(reps):
                sites, label, *_ = _sweep_jit(
                    sites, label, phi, y, lr, wd, ranks, mps.T, cfg, False
                )
            _ = float(jnp.sum(sites))
            best = min(best, (time.perf_counter() - t0) / reps)
        save(name, {
            "sweep_ms": round(best * 1e3, 2),
            "step_us": round(best / (N - 1) * 1e6, 1),
            "compile_s": round(compile_s, 1),
            "checksum_finite": bool(np.isfinite(checksum)),
        })

    time_sweep("sweep_m512_new", "polar")
    time_sweep("sweep_m512_gf_old", "abl:gf_old")
    time_sweep("sweep_m512_identity", "abl:identity")
    time_sweep("sweep_m512_new_nometrics", "polar", step_metrics=False)

    # ---- flagship M=128 -------------------------------------------------
    time_sweep("sweep_m128_polar", "polar", M=128, reps=8)
    time_sweep("sweep_m128_polar_nometrics", "polar", M=128, reps=8,
               step_metrics=False)
    time_sweep("sweep_m128_hybrid", "polar", M=128, reps=8,
               engine="hybrid")
    time_sweep("sweep_m64_hybrid", "polar", M=64, reps=8, engine="hybrid")
    time_sweep("sweep_m64_polar", "polar", M=64, reps=8)

    # ---- serving: XLA vs Pallas forward (VERDICT item 2) ----------------
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.ops.contractions import (
        boundary_vector,
        right_env_stack_fused,
    )
    from tensornetworkforml_tpu.ops.kernels.env_scan import (
        right_env_chain_pallas,
    )

    def serving_point(name, B, N=196, M=64, L=10, reps=50):
        if not want(name):
            return
        if SMOKE:
            N, M, B, reps = 12, 8, 16, 2
        rng = np.random.default_rng(0)
        x_np = rng.random((B, N))
        mps = product_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                           act_fn="linear", loss_fn="MSE",
                           dtype=jnp.float32, calibration_x=x_np)
        x0 = jnp.asarray(x_np, dtype=jnp.float32)

        def xla_one(x):
            phi = psi_embed(x[:, 1:])
            e0 = boundary_vector(M, dtype=jnp.float32)
            return right_env_stack_fused(
                mps.sites[1:], phi.transpose(1, 0, 2), e0
            )[1]

        def pallas_one(x):
            return right_env_chain_pallas(mps.sites[1:], x[:, 1:], chunk=16)

        point = {}
        for key, one in (("xla_us", xla_one), ("pallas_us", pallas_one)):
            if key == "pallas_us" and not on_tpu:
                continue

            @jax.jit
            def looped(x, one=one):
                def body(i, carry):
                    x_c, acc = carry
                    m = jnp.mean(one(x_c))
                    return (x0 + 1e-12 * m, acc + m)

                return jax.lax.fori_loop(0, reps, body,
                                         (x, jnp.float32(0)))[1]

            _ = float(looped(x0))
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                _ = float(looped(x0))
                best = min(best, (time.perf_counter() - t0) / reps)
            point[key] = round(best * 1e6, 1)
        save(name, point)

    serving_point("serving_B256", 256)
    serving_point("serving_B2048", 2048)
    serving_point("serving_B8192", 8192)


if __name__ == "__main__":
    main()
