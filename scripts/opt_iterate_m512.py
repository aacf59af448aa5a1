#!/usr/bin/env python
"""A/B the M=512 factored-split iterate variants on the real chip.

The factored-segments attribution (results/factored_segments.json) puts
~60% of the non-floor M=512 step time in the 19-pass HIGHEST-precision
Newton-Schulz iterate and ~20% in the 14-GF factored sketch. Variants:

  aligned        y0 = B@Om (factored), full iterate, HIGHEST  (baseline)
  gram_full      y0 = G@Om (1 GF), full iterate, HIGHEST
  gram_high      y0 = G@Om, full iterate, HIGH (3-pass bf16)
  gram_mixed     y0 = G@Om, loop HIGH + final HIGHEST
  gram_short     y0 = G@Om, colnorm+final only, HIGHEST (capture check)

Each reports time (fetch-synced, pipelined reps), worst live-column
isometry error, and 1 - captured/exact top-q energy on the gapped
two-site harness (3-decade kept spectrum, 0.06 gap; the
scripts/profile_m512.py spectrum). Results -> results/iterate_variants.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "/root/repo/results/iterate_variants.json"
SMOKE = bool(os.environ.get("TNML_ITER_CPU"))


def gapped_bmat(I, J, rank, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((I, I)))
    v, _ = np.linalg.qr(rng.standard_normal((J, I)))
    s = np.zeros(I)
    s[:rank] = np.logspace(0, -3, rank)
    s[rank:] = 0.06 * s[rank - 1] * np.logspace(0, -2, I - rank)
    return ((u * s) @ v.T).astype(np.float32), s


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tensornetworkforml_tpu.ops.kernels.polar_split import (
        _colnorm,
        _pe_schedule,
        _polar_ns_greedy,
        _PE_FINAL,
        _PE_LOOP,
    )
    from tensornetworkforml_tpu.ops.svd import _rangefinder_omega

    if SMOKE:
        I, J, q = 64, 320, 32
        reps = 4
    else:
        I, J, q = 1024, 10240, 512
        reps = 200

    b_np, s = gapped_bmat(I, J, q)
    b = jnp.asarray(b_np)
    g = jnp.asarray(b_np @ b_np.T)
    om_j = _rangefinder_omega(J, q, jnp.float32)
    om_i = _rangefinder_omega(I, q, jnp.float32)
    y0_b = b @ om_j  # the aligned sketch input (precomputed; its cost is
    # timed separately in results/factored_segments.json)
    y0_g = g @ om_i
    exact = float(np.sum(s[:q] ** 2))

    HI = jax.lax.Precision.HIGHEST
    H3 = jax.lax.Precision.HIGH
    loop_s = _pe_schedule(*_PE_LOOP)
    final_s = _pe_schedule(*_PE_FINAL)

    def full_iter(y0, md_loop, md_final):
        n2 = jnp.trace(g)
        gg = g / jnp.maximum(n2, 1e-30)
        y = _colnorm(y0, 1e-6)
        y = _polar_ns_greedy(y, loop_s, md_loop)
        y = jax.lax.dot_general(
            gg, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=md_loop,
        )
        y = _colnorm(y, 1e-6)
        return _polar_ns_greedy(y, final_s, md_final)

    variants = {
        "aligned": (y0_b, lambda y: full_iter(y, HI, HI)),
        "gram_full": (y0_g, lambda y: full_iter(y, HI, HI)),
        "gram_high": (y0_g, lambda y: full_iter(y, H3, H3)),
        "gram_mixed": (y0_g, lambda y: full_iter(y, H3, HI)),
        "gram_short": (
            y0_g,
            lambda y: _polar_ns_greedy(_colnorm(y, 1e-6), final_s, HI),
        ),
        "aligned_high": (y0_b, lambda y: full_iter(y, H3, H3)),
        # loop phase only conditions -- try 1-pass bf16 there
        "aligned_loopdef": (
            y0_b,
            lambda y: full_iter(y, jax.lax.Precision.DEFAULT, H3),
        ),
        # shortened schedules: loop (3e-3, 0.3) = 4 passes, final
        # (1e-6, 1e-7) = 12 passes (vs 5 + 14)
        "aligned_high_short": (
            y0_b,
            lambda y: _polar_ns_greedy(
                _colnorm(
                    jax.lax.dot_general(
                        g / jnp.maximum(jnp.trace(g), 1e-30),
                        _polar_ns_greedy(
                            _colnorm(y, 1e-6), _pe_schedule(3e-3, 0.3), H3
                        ),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=H3,
                    ),
                    1e-6,
                ),
                _pe_schedule(1e-6, 1e-7), H3,
            ),
        ),
        # shorter final: e_target 1e-5 instead of 1e-7
        "aligned_high_e5": (
            y0_b,
            lambda y: _polar_ns_greedy(
                _colnorm(
                    jax.lax.dot_general(
                        g / jnp.maximum(jnp.trace(g), 1e-30),
                        _polar_ns_greedy(_colnorm(y, 1e-6), loop_s, H3),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=H3,
                    ),
                    1e-6,
                ),
                _pe_schedule(1e-7, 1e-5), H3,
            ),
        ),
    }

    out = {"shape": f"I={I} J={J} q={q}", "reps": reps,
           "loop_passes": len(loop_s), "final_passes": len(final_s)}
    for name, (y0, fn) in variants.items():
        qmat = np.asarray(jax.jit(fn)(y0))
        gq = qmat.T @ qmat
        live = np.diag(gq) > 0.5
        iso = float(np.abs(gq[np.ix_(live, live)]
                           - np.eye(int(live.sum()))).max())
        cap = float(np.sum((qmat.T @ b_np) ** 2)) / exact

        @jax.jit
        def looped(y0v, fn=fn):
            # bump the input each rep so XLA cannot hoist the body
            def body(i, carry):
                y, acc = carry
                m = jnp.sum(fn(y)) * 1e-20
                return (y + m, acc + m)
            return jax.lax.fori_loop(
                0, reps, body, (y0v, jnp.float32(0))
            )[1]

        t0 = time.perf_counter()
        _ = float(looped(y0))
        comp = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(looped(y0))
            best = min(best, (time.perf_counter() - t0) / reps)
        out[name] = {"us": round(best * 1e6, 1),
                     "iso": f"{iso:.2e}", "cap_loss": f"{1 - cap:.2e}",
                     "live": int(live.sum()), "compile_s": round(comp, 1)}
        print(name, out[name], flush=True)

    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
