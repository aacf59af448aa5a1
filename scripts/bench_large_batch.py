#!/usr/bin/env python
"""Large-batch sweep throughput study (round 3, after the MXU-filling
batches result): now that B >= 1024 makes the polar-split sweep
FLOP/bandwidth-bound instead of latency-bound, measure the two levers
that only matter in that regime:

* bf16 STORAGE for sites/envs/phi (halves HBM traffic on the (N,B,M)
  environment stacks; splits still factor in f32 -- ops/svd.py policy).
  Round-3 ablation showed bf16 changes nothing at B=256 because the
  ~110 us/step latency floor hid it; this re-tests at B=2048.
* M=256 at large B (the BASELINE CIFAR-family stretch width).

Protocol: pipelined reps with one host fetch at the end (CLAUDE.md:
block_until_ready does not reliably block through the tunnel), best of
two trials. Writes results/large_batch.json and prints a table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(jax, jnp, dtype, N=196, M=128, L=10, B=256, reps=6,
            method="polar"):
    from bench import V5E_PEAK_FLOPS, analytic_sweep_flops
    from tensornetworkforml_tpu.models.mps import mps_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.sweep import SweepConfig, _sweep_jit

    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical", svd_method=method)
    mps = mps_init(jax.random.PRNGKey(0), N=N, M=M, L=L, act_fn="linear",
                   loss_fn="MSE", dtype=dtype)
    rng = np.random.default_rng(0)
    phi = psi_embed(jnp.asarray(rng.random((B, N)), dtype=dtype))
    y = jnp.asarray(np.eye(L, dtype=np.float32)[rng.integers(0, L, B)].T,
                    dtype=dtype)
    ranks = jnp.full((N - 1,), M, dtype=jnp.int32)
    lr = jnp.asarray(0.05, dtype=dtype)
    wd = jnp.asarray(0.0, dtype=dtype)

    out = _sweep_jit(mps.sites, mps.label_site, phi, y, lr, wd, ranks,
                     mps.T, cfg, False)
    _ = float(jnp.sum(out[0].astype(jnp.float32)))  # compile + fetch-sync
    best = float("inf")
    for _ in range(2):
        sites, label = mps.sites, mps.label_site
        t0 = time.perf_counter()
        for _ in range(reps):
            sites, label, *_ = _sweep_jit(sites, label, phi, y, lr, wd,
                                          ranks, mps.T, cfg, False)
        _ = float(jnp.sum(sites.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / reps)

    flops = analytic_sweep_flops(N=N, M=M, D=2, L=L, B=B, l2=False)
    return {
        "config": f"N={N} M={M} B={B} {method} dtype={dtype.__name__}",
        "sweep_ms": round(best * 1e3, 2),
        "step_us": round(best / (N - 1) * 1e6, 1),
        "samples_per_s": round(B / best),
        "mfu": round(flops / best / V5E_PEAK_FLOPS, 5)
        if jax.default_backend() == "tpu" else None,
    }


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    points = [
        # bf16 storage vs f32, latency-floor regime and FLOP-bound regime
        dict(dtype=jnp.float32, M=128, B=2048, reps=6),
        dict(dtype=jnp.bfloat16, M=128, B=2048, reps=6),
        dict(dtype=jnp.bfloat16, M=128, B=1024, reps=6),
        dict(dtype=jnp.float32, M=128, B=4096, reps=4),
        dict(dtype=jnp.float32, M=128, B=8192, reps=3),
        dict(dtype=jnp.float32, M=128, B=16384, reps=3),
        dict(dtype=jnp.float32, M=256, B=4096, reps=3),
        dict(dtype=jnp.float32, M=256, B=8192, reps=3),
        dict(dtype=jnp.float32, M=512, B=1024, reps=2),
        dict(dtype=jnp.float32, M=512, B=2048, reps=2),
        dict(dtype=jnp.float32, M=512, B=4096, reps=2),
        # stretch width at large batch
        dict(dtype=jnp.float32, M=256, B=1024, reps=4),
        dict(dtype=jnp.float32, M=256, B=2048, reps=4),
        dict(dtype=jnp.bfloat16, M=256, B=2048, reps=4),
    ]
    only = os.environ.get("TNML_LB_ONLY")  # e.g. "bf16_128_2048"
    results = {}
    for p in points:
        key = (f"{'bf16' if p['dtype'] == jnp.bfloat16 else 'f32'}"
               f"_M{p['M']}_B{p['B']}")
        if only and key not in only.split(","):
            continue
        try:
            results[key] = measure(jax, jnp, **p)
        except Exception as e:
            results[key] = {"error": f"{type(e).__name__}: {e}"}
        print(key, "->", results[key], flush=True)

    path = "/root/repo/results/large_batch.json"
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
