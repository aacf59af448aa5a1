#!/usr/bin/env python
"""Segment-level attribution of the factored M=512 two-site step.

The round-5 factored path (train/factored_step.py) measured a wash vs the
materialising path (348 vs 354 ms/sweep, results/factored_m512_tpu.json),
so the win has to come from inside the step. This times each block of
``two_site_update_factored`` in isolation (jitted loops, fetch-synced per
CLAUDE.md) at the stretch shape N=196 M=512 L=10 B=256:

  prelim      loss_der + Lmat/rp/w_t builds
  clip        B_t/grad/delta einsums + L1 abs-sums (the full (I,L,J')
              elementwise work -- the suspected HBM wall)
  gram        factored (I,I) Gram of B_new
  sketch      factored Y0 = B_new @ Omega
  sketch_g    ALTERNATIVE: Y0 = G @ Omega_I (1 GF vs 14 GF -- the Gram is
              already in hand and G@Om is spectrally a free power pass)
  iterate     colnorm -> NS -> G@y -> colnorm -> NS (f32-forced)
  r_fact      R = Q^T B_new from the factors
  f_new       carried-f incremental output update

Results -> results/factored_segments.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "/root/repo/results/factored_segments.json"
SMOKE = bool(os.environ.get("TNML_SEG_CPU"))


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tensornetworkforml_tpu.ops.svd import _rangefinder_omega
    from tensornetworkforml_tpu.train.factored_step import _iterate_xla

    if SMOKE:
        N, M, D, L, B = 12, 8, 2, 4, 16
    else:
        N, M, D, L, B = 196, 512, 2, 10, 256
    I = M * D
    Jp = D * M
    q = min(M, I)
    f32 = jnp.float32
    rng = np.random.default_rng(0)

    def dev(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    label3 = dev(I, L, M) / np.sqrt(M)
    A2m = dev(M, Jp) / np.sqrt(M)
    Lmat = dev(B, I) / np.sqrt(I)
    w_t = dev(B, L, Jp) / np.sqrt(Jp)
    f = dev(L, B)
    qmat = dev(I, q) / np.sqrt(I)
    gmat = dev(I, I)
    gmat = gmat @ gmat.T / I
    y0 = dev(I, q)
    om_flat = _rangefinder_omega(L * Jp, q, f32)
    om = om_flat.reshape(L, Jp, q)
    om_i = _rangefinder_omega(I, q, f32)
    c_t = jnp.float32(0.99)
    c_g = jnp.float32(0.01)
    wd = jnp.float32(0.0)

    def seg_prelim(l_env, x1, x2, r_env, loss_der):
        Lm = jnp.einsum("ba,bi->bai", l_env, x1).reshape(-1, I)
        rp = jnp.einsum("bj,bc->bjc", x2, r_env).reshape(-1, Jp)
        w = jnp.einsum("ob,bj->boj", loss_der, rp)
        return Lm, w

    def seg_clip(label3, A2m, Lmat, w_t):
        B_t = jnp.einsum("iok,kj->ioj", label3, A2m)
        grad = jnp.einsum("bi,boj->ioj", Lmat, w_t)
        delta = grad - wd * B_t
        return jnp.sum(jnp.abs(B_t)), jnp.sum(jnp.abs(delta))

    def seg_gram(label3, A2m, Lmat, w_t):
        GA = A2m @ A2m.T
        T5 = jnp.einsum("iok,km->iom", label3, GA)
        G_tt = jnp.einsum("iom,jom->ij", T5, label3)
        T4 = jnp.einsum("boj,kj->bok", w_t, A2m)
        P3 = jnp.einsum("iok,bok->ib", label3, T4)
        G_x = P3 @ Lmat
        W2 = jnp.einsum("boj,coj->bc", w_t, w_t)
        G_gg = Lmat.T @ (W2 @ Lmat)
        return (c_t * c_t) * G_tt + (c_t * c_g) * (G_x + G_x.T) + (
            c_g * c_g
        ) * G_gg

    def seg_sketch(label3, A2m, Lmat, w_t):
        av = jnp.einsum("kj,ojm->okm", A2m, om)
        y_t = jnp.einsum("iok,okm->im", label3, av)
        wom = jnp.einsum("boj,ojm->bm", w_t, om)
        return c_t * y_t + c_g * (Lmat.T @ wom)

    def seg_sketch_g(g):
        return g @ om_i

    def seg_iterate(y, g):
        n2 = jnp.trace(g)
        with jax.default_matmul_precision("float32"):
            return _iterate_xla(y, g, n2, 1e-6)

    def seg_r(label3, A2m, Lmat, w_t, qm):
        qlab = jnp.einsum("iok,im->mok", label3, qm)
        r_t = jnp.einsum("mok,kj->moj", qlab, A2m)
        qL = Lmat @ qm
        r_g = jnp.einsum("bm,boj->moj", qL, w_t)
        return c_t * r_t + c_g * r_g

    def seg_fnew(Lmat, w_t, rp, f):
        C1 = Lmat @ Lmat.T
        D2 = jnp.einsum("boj,cj->obc", w_t, rp)
        return c_t * f + c_g * jnp.einsum("cb,obc->oc", C1, D2)

    rp_full = dev(B, Jp)
    l_env = dev(B, M)
    x1 = dev(B, D)
    x2 = dev(B, D)
    r_env = dev(B, M)
    loss_der = dev(L, B)

    segs = {
        "prelim": (seg_prelim, (l_env, x1, x2, r_env, loss_der)),
        "clip": (seg_clip, (label3, A2m, Lmat, w_t)),
        "gram": (seg_gram, (label3, A2m, Lmat, w_t)),
        "sketch": (seg_sketch, (label3, A2m, Lmat, w_t)),
        "sketch_g": (seg_sketch_g, (gmat,)),
        "iterate": (seg_iterate, (y0, gmat)),
        "r_fact": (seg_r, (label3, A2m, Lmat, w_t, qmat)),
        "f_new": (seg_fnew, (Lmat, w_t, rp_full, f)),
    }

    # reps must swamp the ~30-40 ms tunnel dispatch round trip: at
    # reps=20 every segment measured ~1536 us (= RTT/20) regardless of
    # its compute -- 200+ puts the floor at ~150 us
    reps = 2 if SMOKE else int(os.environ.get("TNML_SEG_REPS", 200))
    out = {"shape": f"N={N} M={M} L={L} B={B} I={I}", "reps": reps}
    for name, (fn, args) in segs.items():
        @jax.jit
        def looped(args, fn=fn):
            def body(i, carry):
                args_c, acc = carry
                res = fn(*args_c)
                leaf = jax.tree_util.tree_leaves(res)[0]
                m = jnp.sum(leaf) * 1e-20
                bumped = tuple(
                    a + m.astype(a.dtype) if a.ndim and a.dtype == m.dtype
                    else a
                    for a in args_c
                )
                return (bumped, acc + m)

            return jax.lax.fori_loop(0, reps, body, (args, jnp.float32(0)))[1]

        t0 = time.perf_counter()
        _ = float(looped(args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(looped(args))
            best = min(best, (time.perf_counter() - t0) / reps)
        out[name] = {"us": round(best * 1e6, 1),
                     "compile_s": round(compile_s, 1)}
        print(name, out[name], flush=True)

    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
