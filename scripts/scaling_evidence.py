#!/usr/bin/env python
"""Collective-count / communication-volume evidence for docs/SCALING.md
(VERDICT r4 item 6): compile the sharded training paths on the virtual
CPU mesh, parse the optimized HLO for collectives (op, shape, bytes,
computation), and measure step time vs mesh size at fixed global batch.

The claims this verifies (docs/SCALING.md):
  * DP sweep: exactly ONE all-reduce inside the scan body -- the 5-D
    two-site gradient psum -- plus O(1) scalar/metric reductions outside.
  * bond-distributed split: a handful of (I, q)/(q, q) psums per step.
  * brick-wall layer: one batched psum for ALL pair gradients per layer.

CPU-mesh timings are structural evidence only (virtual devices share the
host's cores; ICI bandwidth is not modeled) -- the collective COUNTS and
BYTES are exact properties of the compiled programs, the wall-clocks are
not TPU predictions.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "/root/repo/results/scaling_evidence.json"

from tensornetworkforml_tpu.utils.hlo import (  # noqa: E402
    parse_collectives,
    while_body_names,
)


def summarize(colls, body_names):
    per_op = {}
    for c in colls:
        per_op.setdefault(c["op"], {"count": 0, "bytes": 0})
        per_op[c["op"]]["count"] += 1
        per_op[c["op"]]["bytes"] += c["bytes"]
    in_loop = [c for c in colls if c["computation"] in body_names]
    return {
        "total": per_op,
        "in_scan_body": [
            {"op": c["op"], "shapes": c["shapes"], "bytes": c["bytes"]}
            for c in in_loop
        ],
        "n_collectives": len(colls),
    }


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from tensornetworkforml_tpu.models.mps import mps_init
    from tensornetworkforml_tpu.parallel.dp import make_sharded_train_step
    from tensornetworkforml_tpu.parallel.mesh import make_mesh
    from tensornetworkforml_tpu.train.sweep import SweepConfig

    results = {"workload": {}}
    N, M, L, B = 32, 16, 10, 256
    results["workload"]["dp_sweep"] = dict(N=N, M=M, L=L, global_batch=B)
    rng = np.random.default_rng(0)
    x_np = rng.random((B, N)).astype(np.float32)
    y_np = rng.integers(0, L, B).astype(np.int32)

    devices = jax.devices()
    assert len(devices) >= 8, "needs 8 virtual CPU devices"

    def compile_dp(n, L2_flag=False, dist_split="none", M_=M):
        mesh = make_mesh(
            shape=(n, 1) if dist_split == "none" else (1, n),
            devices=devices[:n],
        )
        cfg = SweepConfig(
            act_fn="linear", loss_fn="MSE", L2_flag=L2_flag,
            split_mode="canonical",
            svd_method="svd" if dist_split == "none" else "cholqr",
        )
        if dist_split != "none":
            cfg = cfg._replace(dist_split=dist_split, dist_mesh=mesh)
        mps = mps_init(jax.random.PRNGKey(0), N=N, M=M_, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=jnp.float32)
        step = make_sharded_train_step(mesh, cfg, mps.T, L, False)
        ranks = jnp.full((N - 1,), M_, dtype=jnp.int32)
        args = (mps.sites, mps.label_site, jnp.asarray(x_np),
                jnp.asarray(y_np), jnp.float32(0.05), jnp.float32(0.0),
                ranks)
        compiled = step.lower(*args).compile()
        return mesh, step, compiled, args

    # --- collective structure: DP sweep at n=8 ---------------------------
    for tag, kw in (
        ("dp8", {}),
        ("dp8_L2", dict(L2_flag=True, )),
        ("bond8_cholqr", dict(dist_split="cholqr", M_=64)),
    ):
        _, _, compiled, _ = compile_dp(8, **kw)
        txt = compiled.as_text()
        results[tag] = summarize(parse_collectives(txt), while_body_names(txt))
        print(tag, "->", json.dumps(results[tag]["total"]), flush=True)

    # --- brick-wall layer ------------------------------------------------
    from tensornetworkforml_tpu.models.boundary import boundary_product_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.brickwall import (
        BrickConfig,
        make_sharded_brick_step,
    )

    mesh8 = make_mesh(shape=(8, 1), devices=devices[:8])
    bmodel = boundary_product_init(
        jax.random.PRNGKey(1), N=N, M=8, L=L, dtype=jnp.float32,
        calibration_x=x_np,
    )
    bstep = make_sharded_brick_step(
        mesh8, bmodel.T, BrickConfig(act_fn="linear", loss_fn="MSE")
    )
    phi_b = psi_embed(jnp.asarray(x_np))
    y1h = jnp.asarray(np.eye(L, dtype=np.float32)[y_np].T)
    bargs = (bmodel.sites, bmodel.w, phi_b, y1h,
             jnp.float32(0.01), jnp.float32(1e-4))
    bcompiled = bstep.lower(*bargs).compile()
    btxt = bcompiled.as_text()
    results["brick8"] = summarize(parse_collectives(btxt), while_body_names(btxt))
    print("brick8 ->", json.dumps(results["brick8"]["total"]), flush=True)

    # --- step time vs mesh size at fixed global batch --------------------
    times = {}
    for n in (1, 2, 4, 8):
        mesh, step, compiled, args = compile_dp(n)
        # warm + chained reps, host-fetch sync
        out = step(*args)
        _ = float(jnp.sum(out[0]))
        reps = 5
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sites, label = args[0], args[1]
            for _ in range(reps):
                sites, label, *_rest = step(sites, label, *args[2:])
            _ = float(jnp.sum(sites))
            best = min(best, (time.perf_counter() - t0) / reps)
        times[str(n)] = round(best * 1e3, 1)
        print(f"dp n={n}: {times[str(n)]} ms/step", flush=True)
    results["dp_step_ms_vs_devices"] = times
    results["note"] = (
        "CPU virtual mesh: collective counts/bytes are exact compiled-"
        "program properties; wall-clocks share host cores and are NOT "
        "TPU predictions"
    )

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
