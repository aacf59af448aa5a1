"""Real-TPU measurement: factored_update at M=512 vs the materialising
path (VERDICT-r4 item 1: break the HBM wall; 356 ms at round-5 start,
target <= 250 ms).

Timing discipline per CLAUDE.md (pipelined dispatch, host-fetch sync).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from tensornetworkforml_tpu.models.mps import mps_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.sweep import SweepConfig, _sweep_jit

    N, M, L, B = 196, 512, 10, 256
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    mps = mps_init(jax.random.PRNGKey(0), N=N, M=M, L=L, act_fn="linear",
                   loss_fn="MSE", dtype=dtype)
    phi = psi_embed(jnp.asarray(rng.random((B, N)), dtype=dtype))
    y = jnp.asarray(np.eye(L, dtype=np.float32)[rng.integers(0, L, B)].T,
                    dtype=dtype)
    ranks = jnp.full((N - 1,), M, dtype=jnp.int32)
    lr = jnp.asarray(0.05, dtype=dtype)
    wd = jnp.asarray(0.0, dtype=dtype)

    def measure(cfg, reps=4):
        t0 = time.perf_counter()
        out = _sweep_jit(mps.sites, mps.label_site, phi, y, lr, wd, ranks,
                         mps.T, cfg, False)
        _ = float(jnp.sum(out[0]))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            sites, label = mps.sites, mps.label_site
            t0 = time.perf_counter()
            for _ in range(reps):
                sites, label, *_ = _sweep_jit(
                    sites, label, phi, y, lr, wd, ranks, mps.T, cfg, False
                )
            _ = float(jnp.sum(sites))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best, compile_s

    base = dict(act_fn="linear", loss_fn="MSE", L2_flag=False,
                split_mode="canonical", svd_method="polar")
    result = {"config": f"N={N} M={M} L={L} B={B} two-site canonical"}
    for name, cfg in (
        ("factored", SweepConfig(**base, factored_update="auto")),
        ("materialising", SweepConfig(**base, factored_update="off")),
        ("factored_nometrics", SweepConfig(**base, factored_update="auto",
                                           step_metrics=False)),
    ):
        try:
            s, comp = measure(cfg)
            result[name] = {
                "sweep_ms": round(s * 1e3, 2),
                "step_us": round(s / (N - 1) * 1e6, 1),
                "compile_s": round(comp, 1),
            }
            print(name, result[name], flush=True)
        except Exception as e:  # noqa: BLE001
            result[name] = {"error": f"{type(e).__name__}: {e}"}
            print(name, "FAILED", e, flush=True)

    with open("/root/repo/results/factored_m512_tpu.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
