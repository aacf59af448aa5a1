#!/usr/bin/env python
"""Headline benchmark: one training epoch of the reference's profiled
workload, on the available accelerator.

Workload (matches the reference's own timing harness,
``old_files/tn_develpment.ipynb`` cell 21; SURVEY.md section 6): N=25
(5x5 diagonals images), bond dim M=20, L=2, 4000 train samples, batch 16 ->
one epoch = 250 batches, each = full forward + full two-site DMRG sweep
(24 merge/gradient/SVD steps). Two baselines are reported:

* ``vs_baseline`` -- against the authors' published 26.18 s/epoch
  (their ~2019 CPU, order-of-magnitude only).
* ``vs_host_reference`` -- against the SAME reference code executed on
  THIS host (measured once per host and cached in ``.bench_host_ref.json``;
  pass ``--measure-reference`` to force a re-measurement, ~90 s).

Also reported: the XLA-counted FLOPs of the fused epoch program and the
resulting MFU (tiny M keeps the MXU mostly idle on this workload -- the
honest number is ~0.1%, epoch time is SVD + small-matmul latency), plus a
high-M datapoint (N=196, M=128, B=256 batch-sweep) where the MXU is
actually loaded.

Prints ONE JSON line with at least
    {"metric": ..., "value": <epoch seconds>, "unit": "s",
     "vs_baseline": <published_reference_time / our_time>}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REFERENCE_EPOCH_S = 26.18  # tn_develpment.ipynb cell 21 (authors' 2019 CPU)
HOST_REF_CACHE = os.path.join(os.path.dirname(__file__), ".bench_host_ref.json")
REFERENCE_DIR = "/root/reference/TensorNetwork"

# TPU v5e single-core peak: 197 TFLOP/s bf16 (the MXU pass f32 matmuls
# default to). MFU below uses this; on other backends mfu is omitted.
V5E_PEAK_FLOPS = 197e12

N_PIXELS = 25
LINEAR_DIM = 5
BOND_DIM = 20
N_LABELS = 2
N_SAMPLES = 4000
BATCH = 16


def measure_host_reference() -> float:
    """Run the reference implementation's epoch (same workload) on this host.

    Single-threaded NumPy, exactly the configuration bench.py times on the
    accelerator (incl. the L2 transfer-matrix regularisation). Returns
    seconds. ~90 s on this host.
    """
    sys.path.insert(0, REFERENCE_DIR)
    import io
    from contextlib import redirect_stdout

    import Network_class as tn

    from tensornetworkforml_tpu.data.diagonals import create_dataset

    data, labels = create_dataset(N_SAMPLES, LINEAR_DIM, sigma=0.5, seed=0)
    x = data.reshape(N_SAMPLES, -1).astype(np.float64)
    phi = np.stack(
        [np.sin(np.pi / 2 * x), np.cos(np.pi / 2 * x)], axis=-1
    )  # the reference's psi embedding (data_generator.py:165-167)
    y = labels.astype(np.int64)

    class Loader:
        def __init__(self, phi, y, batch):
            self.phi, self.y, self.batch = phi, y, batch

        def __len__(self):
            return len(self.phi) // self.batch

        def __iter__(self):
            for b in range(len(self)):
                s = slice(b * self.batch, (b + 1) * self.batch)
                yield list(zip(self.phi[s], self.y[s]))

    train_loader = Loader(phi, y, BATCH)
    val_loader = Loader(phi[:BATCH], y[:BATCH], BATCH)  # minimal val pass
    buf = io.StringIO()
    with redirect_stdout(buf):  # its calibration/progress prints are not
        net = tn.Network(       # the workload
            N=N_PIXELS, M=BOND_DIM, L=N_LABELS, calibration_X=phi[:BATCH],
            normalize=True, act_fn="softmax", loss_fn="full_cross_ent",
        )
        t0 = time.perf_counter()
        net.train(train_loader, val_loader, lr=0.01, n_epochs=1,
                  weight_dec=1.0, L2_flag=True)
        t = time.perf_counter() - t0
    return t


def host_reference_epoch_s(force: bool = False):
    """Same-host reference epoch time, measured once per host and cached."""
    if not force and os.path.exists(HOST_REF_CACHE):
        with open(HOST_REF_CACHE) as fh:
            return json.load(fh)["epoch_s"]
    if not os.path.isdir(REFERENCE_DIR):
        return None
    t = measure_host_reference()
    with open(HOST_REF_CACHE, "w") as fh:
        json.dump(
            {"epoch_s": round(t, 2), "workload": "bench.py headline",
             "note": "reference NumPy implementation, this host, 1 epoch"},
            fh,
        )
    return t


def probe_backend(timeout_s: float = 150.0, platform: str = None):
    """Fail-fast device probe (CLAUDE.md discipline): run one tiny jnp op in
    a SUBPROCESS with a hard timeout before committing to the long benchmark.

    Backend init hangs in native code when the TPU tunnel is down (round-3
    outage: BENCH_r03 rc=1 after a 30-line backtrace, and hung inits of 10+
    minutes) — an in-process probe can't be interrupted, so we probe out of
    process. The probe exits before the main process initializes its own
    backend, so the one-process-per-TPU rule is respected. Returns
    ``(ok, backend_or_error)``.
    """
    import subprocess

    force = (
        f"jax.config.update('jax_platforms', {platform!r}); " if platform
        else ""
    )
    code = (
        "import jax, jax.numpy as jnp; " + force +
        "print('PROBE_OK', jax.default_backend(), float(jnp.ones(()) + 1))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"backend init exceeded {timeout_s:.0f}s (tunnel down?)"
    if r.returncode != 0 or "PROBE_OK" not in r.stdout:
        tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
        return False, f"probe rc={r.returncode}: {' '.join(tail)[:300]}"
    return True, r.stdout.split("PROBE_OK", 1)[1].split()[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure-reference", action="store_true",
                    help="re-measure the reference epoch on this host (~90s)")
    ap.add_argument("--skip-high-m", action="store_true",
                    help="skip the high-M MXU-loaded datapoint")
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the fail-fast backend probe")
    args = ap.parse_args()

    if not args.no_probe:
        ok, info = probe_backend()
        if not ok:
            print(json.dumps({
                "metric": "diagonals epoch time (N=25, M=20, batch=16,"
                          " 4000 samples, full sweep per batch)",
                "value": None, "unit": "s", "vs_baseline": None,
                "error": f"accelerator unavailable: {info}",
            }))
            return 1

    try:
        return _run(args)
    except Exception as e:  # never exit without a JSON line on stdout
        print(json.dumps({
            "metric": "diagonals epoch time (N=25, M=20, batch=16,"
                      " 4000 samples, full sweep per batch)",
            "value": None, "unit": "s", "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:500],
        }))
        return 1


def _run(args):
    import jax

    # one-time compile of the fused-epoch program dominates cold starts;
    # cache it on disk so repeated benchmark runs measure execution.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tensornetworkforml_tpu.data.diagonals import create_dataset
    from tensornetworkforml_tpu.models.mps import mps_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.epoch import _epoch_scan, fused_epoch
    from tensornetworkforml_tpu.train.sweep import SweepConfig

    dtype = jnp.float32

    data, labels = create_dataset(N_SAMPLES, LINEAR_DIM, sigma=0.5, seed=0)
    n_batches = N_SAMPLES // BATCH
    x_epoch = data.reshape(N_SAMPLES, -1).astype(np.float32)
    x_epoch = x_epoch[: n_batches * BATCH].reshape(n_batches, BATCH, N_PIXELS)
    y_epoch = labels.astype(np.int32)[: n_batches * BATCH].reshape(
        n_batches, BATCH
    )

    phi_cal = psi_embed(jnp.asarray(x_epoch[0], dtype=dtype))
    mps = mps_init(
        jax.random.PRNGKey(0),
        N=N_PIXELS,
        M=BOND_DIM,
        L=N_LABELS,
        normalize=True,
        calibration_phi=phi_cal,
        act_fn="softmax",
        loss_fn="full_cross_ent",
        dtype=dtype,
    )
    cfg = SweepConfig(act_fn="softmax", loss_fn="full_cross_ent",
                      L2_flag=True, svd_method="svd")

    # warm-up epoch: compiles the fused whole-epoch program (one dispatch
    # per epoch -- embedding + forward + alternating-direction sweeps for
    # all batches inside a single lax.scan)
    mps_w, accs, _ = fused_epoch(mps, x_epoch, y_epoch, 0.01, 1.0, cfg)
    _ = np.asarray(mps_w.sites)  # full host sync

    t0 = time.perf_counter()
    mps_out, accs, _ = fused_epoch(mps, x_epoch, y_epoch, 0.01, 1.0, cfg)
    accs = np.asarray(accs)  # host fetch forces full execution
    checksum = float(np.asarray(mps_out.sites).sum())
    epoch_s = time.perf_counter() - t0

    assert np.isfinite(checksum), "training diverged"
    assert accs.shape[0] == n_batches

    # Analytic FLOP count -> MFU. (XLA's cost_analysis counts a lax.scan
    # body ONCE, not x length, so it cannot price the fused epoch; the
    # analytic model below counts the leading contraction terms and is a
    # LOWER bound -- SVD iterations and elementwise ops excluded.)
    epoch_flops = analytic_sweep_flops(
        N=N_PIXELS, M=BOND_DIM, D=2, L=N_LABELS, B=BATCH, l2=True
    ) * n_batches
    mfu = (
        epoch_flops / epoch_s / V5E_PEAK_FLOPS
        if jax.default_backend() == "tpu"
        else None
    )

    result = {
        "metric": "diagonals epoch time (N=25, M=20, batch=16, 4000 samples,"
                  " full sweep per batch)",
        "value": round(epoch_s, 4),
        "unit": "s",
        "vs_baseline": round(REFERENCE_EPOCH_S / epoch_s, 2),
    }

    host_ref = host_reference_epoch_s(force=args.measure_reference)
    if host_ref:
        result["host_reference_s"] = round(host_ref, 2)
        result["vs_host_reference"] = round(host_ref / epoch_s, 2)
    result["epoch_gflops_analytic"] = round(epoch_flops / 1e9, 3)
    if mfu is not None:
        # honest number: tiny M keeps the MXU idle; epoch time is SVD and
        # small-matmul latency, not FLOPs
        result["mfu"] = round(mfu, 7)
        result["peak_flops_assumed"] = V5E_PEAK_FLOPS

    # High-M datapoint: one 195-step batch-sweep at N=196, M=128, B=256
    # (the Fashion/CIFAR config family of BASELINE.json) where the MXU is
    # actually loaded, with analytic FLOPs and MFU -- for the exact-SVD
    # split and for the TPU-fast rangefinder split (ops/svd.py).
    if not args.skip_high_m:
        for key, method, m_dim, n_reps in (
                ("high_m", "svd", 128, 8),
                ("high_m_rangefinder", "rangefinder", 128, 8),
                ("high_m_cholqr", "cholqr", 128, 8),
                ("high_m_polar", "polar", 128, 8),
                # round-5 flagship: pre-split + iterate Mosaic kernels,
                # one batched R matmul per step (engine='hybrid',
                # ops/kernels/presplit_kernel.py) -- measured 60.3
                # us/step vs 80.5 XLA polar (results/hybrid_engine_tpu)
                ("high_m_hybrid", "polar:hybrid", 128, 8),
                # M=256 stretch (BASELINE CIFAR family): polar dispatches
                # to the two-stage Pallas split (round 3) -- 1.5x cholqr
                ("stretch_m256_polar", "polar", 256, 4),
                # M=512 stretch (round 5): factored_update="auto"
                # reroutes M*D > 512 to the factored step
                # (train/factored_step.py) -- B_new never materialised,
                # HIGH-precision shortened-schedule iterate; measured
                # 249.5 ms/sweep (9.0% analytic MFU) vs the round-4
                # gram-free 616 ms (results/factored_m512_tpu.json)
                ("stretch_m512_polar", "polar", 512, 4)):
            try:
                result[key] = _high_m_point(
                    jax, jnp, dtype, method=method, M=m_dim, reps=n_reps
                )
            except Exception as e:  # never lose the headline to extras
                result[key + "_error"] = f"{type(e).__name__}: {e}"
        # MXU-filling batches (round 3): the polar split is B-independent,
        # so large batches scale useful FLOPs at near-constant sweep
        # latency -- measured 11.7k -> 82k -> 104k samples/s (4.1% ->
        # 24.1% -> 30.2% MFU) at B=256/4096/8192 on one v5e core
        # (results/large_batch.json)
        for key, b_sz, n_reps in (("high_m_polar_b1024", 1024, 6),
                                  ("high_m_polar_b2048", 2048, 6),
                                  ("high_m_polar_b4096", 4096, 4),
                                  ("high_m_polar_b8192", 8192, 3)):
            try:
                result[key] = _high_m_point(
                    jax, jnp, dtype, method="polar", B=b_sz, reps=n_reps
                )
            except Exception as e:
                result[key + "_error"] = f"{type(e).__name__}: {e}"
        try:
            result["inference"] = _inference_point(jax, jnp, dtype)
        except Exception as e:
            result["inference_error"] = f"{type(e).__name__}: {e}"
        try:
            result["brickwall"] = _brickwall_point(jax, jnp, dtype)
        except Exception as e:
            result["brickwall_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(result))


def analytic_sweep_flops(N, M, D, L, B, l2=False) -> float:
    """Leading-term FLOP count of one batch forward + one full two-site
    sweep (N-1 steps). Multiply-adds counted as 2 FLOPs; SVD iterations,
    activations, and other elementwise work EXCLUDED -- a lower bound on
    useful work, which is the convention that keeps MFU honest.

    Per-step terms (see train/sweep.py::two_site_update):
      merge          2 M^3 D^2 L      (site x label-site over the bond)
      phi outer      2 B D^2          ((B,D)x(B,D) -> (B,D,D))
      Phi envs       2 B M^2 D^2      (left/right env outer products)
      f recompute    2 B L M^2 D^2    (B_two x Phi, batched)
      deltaB         2 B L M^2 D^2    (loss_der x Phi, batch-contracted)
      env extend     2 B M^2 D
      L2 (optional)  2 M^3 D + 2 M^3 D^2 L   (transfer extend + grad)

    Per-batch forward: N site contractions 2 B M^2 D + N env chain steps
    2 B M^2 (+ label contraction 2 B L M^2 once).
    """
    step = (
        2 * M**3 * D**2 * L
        + 2 * B * D**2
        + 2 * B * M**2 * D**2
        + 2 * (2 * B * L * M**2 * D**2)
        + 2 * B * M**2 * D
    )
    if l2:
        step += 2 * M**3 * D + 2 * M**3 * D**2 * L
    forward = N * (2 * B * M**2 * D + 2 * B * M**2) + 2 * B * L * M**2
    return float(forward + (N - 1) * step)


def _high_m_point(jax, jnp, dtype, N=196, M=128, L=10, B=256, reps=8,
                  method="svd"):
    from tensornetworkforml_tpu.models.mps import mps_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.sweep import (
        SweepConfig,
        _sweep_jit,
    )

    engine = "xla"
    if ":" in method:
        method, engine = method.split(":")
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=False,
                      split_mode="canonical", svd_method=method,
                      engine=engine)
    mps = mps_init(jax.random.PRNGKey(0), N=N, M=M, L=L, act_fn="linear",
                   loss_fn="MSE", dtype=dtype)
    rng = np.random.default_rng(0)
    phi = psi_embed(jnp.asarray(rng.random((B, N)), dtype=dtype))
    y = jnp.asarray(
        np.eye(L, dtype=np.float32)[rng.integers(0, L, B)].T, dtype=dtype
    )
    ranks = jnp.full((N - 1,), M, dtype=jnp.int32)
    lr = jnp.asarray(0.05, dtype=dtype)
    wd = jnp.asarray(0.0, dtype=dtype)

    args = (mps.sites, mps.label_site, phi, y, lr, wd, ranks, mps.T, cfg,
            False)
    out = _sweep_jit(*args)
    _ = float(jnp.sum(out[0]))  # compile + warm (host fetch: through the
    # tunnel block_until_ready may return once dispatches are QUEUED; only
    # a fetch proves execution -- CLAUDE.md)
    # pipelined reps, best of 2 trials (the device link is noisy)
    sweep_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        sites, label = mps.sites, mps.label_site
        for _ in range(reps):
            sites, label, *_ = _sweep_jit(
                sites, label, phi, y, lr, wd, ranks, mps.T, cfg, False
            )
        _ = float(jnp.sum(sites))
        sweep_s = min(sweep_s, (time.perf_counter() - t0) / reps)

    flops = analytic_sweep_flops(N=N, M=M, D=2, L=L, B=B, l2=False)
    point = {
        "config": f"N={N} M={M} L={L} B={B} canonical two-site sweep"
                  f" ({method} split"
                  + (f", {engine} engine)" if engine != "xla" else ")"),
        "sweep_ms": round(sweep_s * 1e3, 2),
        "step_us": round(sweep_s / (N - 1) * 1e6, 1),
        "sweep_gflops_analytic": round(flops / 1e9, 2),
        "samples_per_s": round(B / sweep_s),
    }
    if jax.default_backend() == "tpu":
        point["mfu"] = round(flops / sweep_s / V5E_PEAK_FLOPS, 5)
    return point


def _brickwall_point(jax, jnp, dtype, N=196, M=32, L=10, B=256, reps=12):
    """Brick-wall parallel-bond sweep (train/brickwall.py): every bond
    updated once per sweep like the sequential engines, but as two batched
    layers (O(1) update depth). Chained dispatches, host-fetch sync."""
    from tensornetworkforml_tpu.models.boundary import boundary_product_init
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.train.brickwall import BrickConfig, _brick_jit

    rng = np.random.default_rng(0)
    x = rng.random((B, N)).astype(np.float32)
    phi = psi_embed(jnp.asarray(x, dtype=dtype))
    y1h = jnp.asarray(np.eye(L, dtype=np.float32)[rng.integers(0, L, B)].T,
                      dtype=dtype)
    lr = jnp.asarray(0.002, dtype)
    wd = jnp.asarray(1e-5, dtype)
    model = boundary_product_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                                  dtype=dtype, calibration_x=x)
    cfg = BrickConfig(act_fn="linear", loss_fn="MSE")
    out = _brick_jit(model.sites, model.w, phi, y1h, lr, wd, model.T, cfg)
    _ = float(jnp.sum(out[0]))
    best = float("inf")
    for _ in range(2):
        s, w = model.sites, model.w
        t0 = time.perf_counter()
        for _ in range(reps):
            s, w, _m = _brick_jit(s, w, phi, y1h, lr, wd, model.T, cfg)
        _ = float(jnp.sum(s))
        best = min(best, (time.perf_counter() - t0) / reps)
    return {
        "config": f"N={N} M={M} L={L} B={B} brick-wall sweep "
                  f"(2 batched layers, cholqr splits)",
        "sweep_ms": round(best * 1e3, 2),
        "bond_update_us": round(best / (N - 1) * 1e6, 1),
    }


def _inference_point(jax, jnp, dtype, N=196, M=64, L=10, B=256, reps=50):
    """Serving forward, device time via an in-jit repetition loop (per-call
    timings through the high-latency link measure dispatch, not compute):
    the Pallas fused embed+chain kernel (the single-chip serving default)
    vs the XLA env scan."""
    from tensornetworkforml_tpu.models.mps import product_init
    from tensornetworkforml_tpu.ops.contractions import (
        boundary_vector,
        right_env_stack_fused,
    )
    from tensornetworkforml_tpu.ops.embedding import psi_embed
    from tensornetworkforml_tpu.ops.kernels.env_scan import (
        right_env_chain_pallas,
    )

    rng = np.random.default_rng(0)
    x_np = rng.random((B, N))
    mps = product_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                       act_fn="linear", loss_fn="MSE", dtype=dtype,
                       calibration_x=x_np)
    x0 = jnp.asarray(x_np, dtype=dtype)

    def xla_one(x):
        phi = psi_embed(x[:, 1:])
        e0 = boundary_vector(M, dtype=dtype)
        return right_env_stack_fused(
            mps.sites[1:], phi.transpose(1, 0, 2), e0
        )[1]

    def pallas_one(x):
        return right_env_chain_pallas(mps.sites[1:], x[:, 1:], chunk=16)

    def make_looped(one):
        @jax.jit
        def looped(x):
            def body(i, carry):
                x_c, acc = carry
                m = jnp.mean(one(x_c))
                return (x0 + 1e-12 * m, acc + m)

            _, acc = jax.lax.fori_loop(0, reps, body, (x, jnp.float32(0)))
            return acc

        return looped

    point = {"config": f"N={N} M={M} L={L} B={B} forward (device time)"}
    for name, one in (("xla_us", xla_one), ("pallas_us", pallas_one)):
        f = make_looped(one)
        jax.block_until_ready(f(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(f(x0))
            best = min(best, (time.perf_counter() - t0) / reps)
        point[name] = round(best * 1e6, 1)
    return point


if __name__ == "__main__":
    sys.exit(main())
