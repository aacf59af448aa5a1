"""Epoch-level training loop with reference-compatible metrics history.

Reference equivalent: ``Network.train`` (``Network_class.py:261-350``) --
per batch: forward, pre-update accuracy, then one full sweep in the
direction given by where the label leg sits (so direction alternates per
batch, each direction seeing a fresh batch -- a deliberate design choice of
the reference, report section III); then a validation accuracy pass per
epoch.

``var_hist`` layout matches the reference exactly
(``Network_class.py:293-301``): shape ``(n_epochs, n_series, n_steps)``
where ``n_steps = batches_per_epoch * (N-1)``; 2 series (accuracy, MAE) by
default, 7 in debug mode.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.models.mps import (
    MPS,
    accuracy_from_scores,
    mps_forward,
)
from tensornetworkforml_tpu.ops.embedding import psi_embed
from tensornetworkforml_tpu.train.sweep import SweepConfig, sweep_once

_DEBUG_SERIES = (
    "mean_abs_B",
    "mean_abs_deltaB",
    "accuracy",
    "mean_abs_f",
    "MAE",
    "L2_loss",
    "mean_abs_L2_grad",
)
_PLAIN_SERIES = ("accuracy", "MAE")

# bond dimension at which train_model(norm_spread="auto") engages the
# end-of-sweep gauge rebalance: M=128 canonical runs are measured-stable
# in the accumulated gauge (results/fashion_gate.json), M=512 annihilates
# without it (results/m512_twosweep_tpu.json)
_NORM_SPREAD_MIN_M = 256


def _loader_batches(loader):
    """Yield stacked ``(x, y)`` arrays from ours or reference-style loaders."""
    if hasattr(loader, "batches"):
        yield from loader.batches()
    else:  # torch-style loader with identity collate: list of (x, y) pairs
        for data in loader:
            x = np.array([pair[0] for pair in data])
            y = np.array([pair[1] for pair in data])
            yield x, y


def _as_phi(x: np.ndarray, dtype) -> jnp.ndarray:
    """Accept raw pixels ``(B, N)`` or pre-embedded ``(B, N, D)``."""
    x = jnp.asarray(x, dtype=dtype)
    if x.ndim == 2:
        return psi_embed(x)
    return x


from functools import partial as _partial

import jax as _jax


@_partial(_jax.jit, static_argnames=("l_pos",))
def _eval_scan(sites, label_site, x_epoch, y_epoch, l_pos):
    """All validation batches in ONE program (one dispatch per eval pass)."""
    from tensornetworkforml_tpu.models.mps import _forward_arrays

    def body(_, xy):
        x, y = xy
        phi = psi_embed(x.astype(sites.dtype))
        scores = _forward_arrays(sites, label_site, phi, l_pos)
        acc = jnp.mean((jnp.argmax(scores, axis=0) == y).astype(sites.dtype))
        return None, acc

    _, accs = _jax.lax.scan(body, None, (x_epoch, y_epoch))
    return jnp.mean(accs)


def evaluate_accuracy(mps: MPS, loader) -> float:
    """Mean batch accuracy over a loader (reference validation loop).

    Uniform raw-pixel batches are evaluated in a single fused scan (one
    device dispatch); otherwise falls back to per-batch forwards.
    """
    batches = list(_loader_batches(loader))
    if not batches:
        return float("nan")
    xs = [np.asarray(x) for x, _ in batches]
    ys = [np.asarray(y) for _, y in batches]
    uniform = (
        all(x.ndim == 2 for x in xs)
        and len({x.shape for x in xs}) == 1
        and len({y.shape for y in ys}) == 1
    )
    if uniform:
        acc = _eval_scan(
            mps.sites,
            mps.label_site,
            jnp.asarray(np.stack(xs)),
            jnp.asarray(np.stack(ys)),
            mps.l_pos,
        )
        return float(acc)
    accs = []
    for x, y in batches:
        phi = _as_phi(x, mps.dtype)
        scores = mps_forward(mps, phi)
        accs.append(float(accuracy_from_scores(scores, jnp.asarray(y))))
    return float(np.mean(accs))


def stall_detected(
    val_acc,
    warmup_epochs: int = 0,
    patience: int = 2,
    min_delta: float = 0.005,
    threshold: float = 0.95,
    n_epochs: int = None,
) -> bool:
    """True when a per-epoch validation-accuracy series below
    ``threshold`` has either PLATEAUED or cannot PROJECT to the
    threshold inside the epoch budget:

    * plateau: the last ``patience`` epochs improved the best prior
      value by at most ``min_delta``;
    * projection (only when ``n_epochs`` is given): extrapolating the
      best value at the improvement rate of the last ``patience``
      epochs over the remaining budget still lands below ``threshold``.
      This catches the measured slow-creep basin (+0.006-0.01/epoch at
      ~0.90 -- results/restart_gate.json seed 2) that clears the
      plateau bar every epoch yet can never reach 0.95 in budget, while
      leaving genuinely fast-improving runs alone.

    Both arms need at least one post-warmup pre-window epoch to compare
    against. This is the stalled-init-basin signature measured on the
    large-batch recipe (results/recipe_robustness.json: one seed in five
    settles flat at ~0.84 at B=256 while the rest reach ~1.0 within two
    epochs, and a later small-batch polish does NOT recover it --
    BENCH_NOTES round 3). Runs that reach ``threshold`` are never
    flagged, so converged-good plateaus (e.g. holding 1.0) don't
    trigger restarts.
    """
    vals = [float(v) for v in val_acc]
    if len(vals) < warmup_epochs + patience + 1:
        return False
    if max(vals) >= threshold:
        return False
    window = vals[-patience:]
    prior = max(vals[:-patience])
    if max(window) <= prior + min_delta:
        return True
    if n_epochs is not None:
        best = max(vals)
        rate = max(0.0, (best - prior) / patience)
        remaining = max(0, int(n_epochs) - len(vals))
        return best + rate * remaining < threshold
    return False


def train_model(
    mps: MPS,
    train_loader,
    val_loader,
    lr: float,
    n_epochs: int = 10,
    weight_dec: float = 0.001,
    L2_flag: bool = True,
    debug: bool = False,
    svd_method: str = "svd",
    split_mode: str = "shared",
    renorm_envs: bool = False,
    growth_cap: float = 0.0,
    matmul_precision: str = "default",
    rank_mode: str = "fixed",
    adaptive_tol: float = 1e-4,
    fused: bool = True,
    verbose: bool = True,
    epoch_callback: Optional[Callable] = None,
    checkpoint_path: Optional[str] = None,
    resume: bool = False,
    warmup_epochs: int = 0,
    warmup_batch_divisor: Optional[int] = None,
    bond_schedule: Optional[dict] = None,
    restarts: int = 0,
    reinit_fn: Optional[Callable[[int], MPS]] = None,
    stall_patience: int = 2,
    stall_min_delta: float = 0.005,
    stall_threshold: float = 0.95,
    factored_update: str = "auto",
    norm_spread: str = "auto",
):
    """Train an MPS; returns ``(mps, val_acc, var_hist)``.

    ``matmul_precision``: "default" (bf16 MXU passes on TPU, fastest),
    "tensorfloat32", or "float32" (full precision, ~2-3x contraction cost);
    applied to every contraction on both the fused-epoch and per-batch
    paths.

    ``val_acc`` is a list of per-epoch validation accuracies and
    ``var_hist`` a ``(n_epochs, n_series, n_steps)`` array, both matching
    the reference ``Network.train`` return contract.

    ``lr`` may be a float or a callable ``epoch -> float`` (schedules).

    With ``checkpoint_path``, the model + epoch counter are saved after
    every epoch, and ``resume=True`` continues an interrupted run from the
    last saved epoch -- the mid-training checkpoint/resume the reference
    lacks (it only pickles the final model, ``training_diagonals.py:69``).

    ``warmup_epochs``: run the first epochs at ``batch_size /
    warmup_batch_divisor``. Large clean batches settle into init-dependent
    attractors of the greedy bond-wise optimisation (measured: 0.20
    final-val spread across seeds at B=256, flat for 8+ epochs; the same
    seeds reach ~1.0 at B=128) -- a warmup epoch in the small-batch basin
    restores it and the large batch then holds it (spread 0.037). The
    active ingredient is the ABSOLUTE warmup batch size, not the ratio:
    at B=1024 a half-batch (512) warmup still lands at test 0.71 while a
    B=128 warmup reaches 0.97+ (round 3, results/large_batch_quality.json).
    ``warmup_batch_divisor=None`` (default) therefore picks the divisor
    that lands the warmup at <= 128 samples (``max(2, batch_size//128)``);
    pass an int to override.
    Requires an ``ArrayLoader`` train loader; with warmup the per-epoch
    step counts differ, so ``var_hist`` is returned as an object array.

    ``bond_schedule``: ``{epoch: M}`` -- at the start of each listed epoch
    the MPS is embedded into the larger bond dimension
    (``models.mps.grow_bond``: zero padding, function preserved exactly;
    one re-jit per growth). Grow-as-you-train approaches large-M quality
    without paying max-M sweep cost from epoch 0.

    ``restarts``: the greedy bond-wise optimisation has init-dependent
    attractors -- at B > 128 roughly one seed in five settles into a flat
    sub-0.9 basin that neither more epochs nor a later small-batch phase
    recovers (measured, BENCH_NOTES round 3). With ``restarts=k``, a run
    whose validation accuracy plateaus below ``stall_threshold`` for
    ``stall_patience`` epochs (``stall_detected``) is ABORTED and retried
    from a fresh init up to ``k`` times; the attempt with the best final
    validation accuracy is returned. Requires ``reinit_fn(attempt) ->
    MPS`` (attempt >= 1) supplying the fresh inits -- pass e.g. a
    ``product_init`` closure over a reseeded PRNG key. Checkpoint files
    track the CURRENT attempt; resuming an interrupted run re-enters the
    first attempt.
    """
    start_epoch = 0
    if checkpoint_path and resume and os.path.exists(checkpoint_path):
        from tensornetworkforml_tpu.utils.checkpoint import (
            load_training_state,
        )

        mps, start_epoch = load_training_state(checkpoint_path, mps)
        if verbose and start_epoch:
            print(f"resuming from epoch {start_epoch}")
    # gauge hygiene: canonical fixed-rank sweeps park junk ridge norm in
    # the label core (~1e9 after one large-M sweep) whose compensating
    # site shrink underflows the NEXT sweep's env cascades in f32 on TPU
    # and annihilates the model to exact zeros
    # (results/m512_twosweep_tpu.json). The end-of-sweep rebalance is
    # function-preserving but NOT dynamics-preserving (clip and step
    # sizes are gauge-relative), so "auto" engages it per-epoch only in
    # the underflow-risk regime: canonical fixed-rank sweeps at
    # M >= _NORM_SPREAD_MIN_M (validated small-M recipes keep their
    # measured behavior bit-for-bit).
    spread_auto = norm_spread == "auto"
    spread = False if spread_auto else bool(norm_spread)
    cfg = SweepConfig(
        act_fn=mps.act_fn,
        loss_fn=mps.loss_fn,
        L2_flag=L2_flag,
        svd_method=svd_method,
        debug=debug,
        split_mode=split_mode,
        renorm_envs=renorm_envs,
        growth_cap=growth_cap,
        matmul_precision=matmul_precision,
        rank_mode=rank_mode,
        adaptive_tol=adaptive_tol,
        factored_update=factored_update,
        norm_spread=spread,
    )
    series = _DEBUG_SERIES if debug else _PLAIN_SERIES
    val_acc: list[float] = []
    var_hist: list[list[np.ndarray]] = []
    lr_fn = lr if callable(lr) else (lambda _epoch: lr)

    fallback_warned = False
    warm_loader = None
    if warmup_epochs > 0:
        from tensornetworkforml_tpu.data.loader import (
            warmup_batch_size,
            with_batch_size,
        )

        if not hasattr(train_loader, "dataset"):
            raise ValueError(
                "warmup_epochs requires an ArrayLoader train loader"
            )
        warm_b = (
            max(1, train_loader.batch_size // warmup_batch_divisor)
            if warmup_batch_divisor is not None
            else warmup_batch_size(train_loader.batch_size)
        )
        warm_loader = with_batch_size(
            train_loader, warm_b, even_batches=True,
        )

    def _run_attempt(mps, first_epoch, abort_on_stall):
        """One training attempt; returns ``(mps, val_acc, var_hist,
        stalled)`` where ``stalled`` means the attempt was aborted by
        ``stall_detected`` (only possible when ``abort_on_stall``)."""
        nonlocal fallback_warned
        val_acc: list[float] = []
        var_hist: list[list[np.ndarray]] = []
        stalled = False
        for epoch in range(first_epoch, n_epochs):
            if bond_schedule and epoch in bond_schedule:
                from tensornetworkforml_tpu.models.mps import grow_bond

                new_M = int(bond_schedule[epoch])
                if verbose and new_M > mps.M:
                    print(f"epoch {epoch}: growing bond dimension "
                          f"{mps.M} -> {new_M}")
                mps = grow_bond(mps, new_M)
            epoch_cfg = cfg
            if (
                spread_auto
                and rank_mode == "fixed"
                and split_mode == "canonical"
                and mps.M >= _NORM_SPREAD_MIN_M
            ):
                epoch_cfg = cfg._replace(norm_spread=True)
            epoch_loader = (
                warm_loader if epoch < warmup_epochs else train_loader
            )
            epoch_lr = float(lr_fn(epoch))
            epoch_series: dict[str, list[np.ndarray]] = {k: [] for k in series}
            train_accs = []

            # Whole-epoch fusion: when the epoch's batches are uniform raw-pixel
            # arrays (and the config allows it), run the ENTIRE epoch as one
            # device program (train/epoch.py) -- one dispatch instead of one per
            # batch. Falls back to the per-batch loop otherwise.
            batch_iter = None
            fallback_reason = None
            if fused and not debug and cfg.rank_mode == "fixed" and mps.l_pos == 0:
                batches = list(_loader_batches(epoch_loader))
                xs_np = [np.asarray(x) for x, _ in batches]
                ys_np = [np.asarray(y) for _, y in batches]
                uniform = (
                    len(batches) >= 2
                    and len(batches) % 2 == 0
                    and all(x.ndim == 2 for x in xs_np)
                    and len({x.shape for x in xs_np}) == 1
                    and len({y.shape for y in ys_np}) == 1
                )
                if uniform:
                    from tensornetworkforml_tpu.train.epoch import fused_epoch

                    mps, accs, stepm = fused_epoch(
                        mps, np.stack(xs_np), np.stack(ys_np), epoch_lr,
                        weight_dec, epoch_cfg,
                    )
                    train_accs = [float(a) for a in np.asarray(accs)]
                    epoch_series["accuracy"].append(
                        np.asarray(stepm["accuracy"]).reshape(-1)
                    )
                    epoch_series["MAE"].append(np.asarray(stepm["MAE"]).reshape(-1))
                    batch_iter = ()  # epoch fully handled by the fused program
                else:
                    fallback_reason = (
                        "non-uniform batch shapes or odd batch count"
                    )
                    batch_iter = iter(batches)  # replay the drawn batches
            if batch_iter is None:
                if fused and not debug:
                    fallback_reason = (
                        f"rank_mode={cfg.rank_mode!r}"
                        if cfg.rank_mode != "fixed"
                        else f"label leg at site {mps.l_pos} (needs 0)"
                    )
                batch_iter = _loader_batches(epoch_loader)
            if fallback_reason is not None and not fallback_warned:
                import warnings

                fallback_warned = True
                warnings.warn(
                    "fused-epoch path unavailable ({}); falling back to one "
                    "dispatch PER BATCH -- on a high-latency device link this "
                    "is a 10-100x slowdown".format(fallback_reason),
                    stacklevel=2,
                )

            n_batches = len(epoch_loader) if hasattr(epoch_loader, "__len__") else None
            for i, (x, y) in enumerate(batch_iter):
                phi = _as_phi(x, mps.dtype)
                y = jnp.asarray(np.asarray(y))
                y_onehot = jnp.zeros((mps.L, y.shape[0]), dtype=mps.dtype)
                y_onehot = y_onehot.at[y, jnp.arange(y.shape[0])].set(1.0)

                mps, f0, _, metrics = sweep_once(
                    mps, phi, y_onehot, epoch_lr, weight_dec, epoch_cfg
                )
                batch_acc = float(accuracy_from_scores(f0, y))
                train_accs.append(batch_acc)
                for k in series:
                    epoch_series[k].append(np.asarray(metrics[k]))

                if verbose:
                    frac = (i + 1) * 100 / n_batches if n_batches else 0.0
                    print(
                        f"\rEpoch {epoch}/{n_epochs} - train accuracy : "
                        f"{batch_acc:.4f} - completed : {frac:.2f} %",
                        end=" ",
                    )

            var_hist.append(
                [np.concatenate(epoch_series[k]) for k in series]
                if train_accs
                else [np.zeros((0,)) for _ in series]
            )

            epoch_val = evaluate_accuracy(mps, val_loader)
            val_acc.append(epoch_val)
            if abort_on_stall and stall_detected(
                val_acc, warmup_epochs, stall_patience, stall_min_delta,
                stall_threshold, n_epochs=n_epochs,
            ):
                stalled = True
            if verbose:
                print(
                    f"\rEpoch {epoch}/{n_epochs} - train accuracy : "
                    f"{np.mean(train_accs):.4f} - val accuracy: {epoch_val:.4f}"
                )
            if checkpoint_path:
                from tensornetworkforml_tpu.utils.checkpoint import (
                    save_training_state,
                )

                save_training_state(checkpoint_path, mps, epoch + 1)
            if epoch_callback is not None:
                epoch_callback(epoch, mps, epoch_val)
            if stalled:
                break

        return mps, val_acc, var_hist, stalled

    if restarts > 0 and reinit_fn is None:
        raise ValueError("restarts > 0 requires reinit_fn(attempt) -> MPS")
    best = None
    attempts_run = 0
    for attempt in range(max(0, int(restarts)) + 1):
        model0 = mps if attempt == 0 else reinit_fn(attempt)
        first = start_epoch if attempt == 0 else 0
        abort = attempt < restarts
        model, a_val, a_hist, stalled = _run_attempt(model0, first, abort)
        attempts_run += 1
        score = a_val[-1] if a_val else float("-inf")
        if best is None or score > best[0]:
            best = (score, model, a_val, a_hist, first + len(a_val))
        if not stalled:
            break
        if verbose:
            print(
                f"validation stalled at {score:.4f}; restarting from a "
                f"fresh init (attempt {attempt + 1}/{restarts})"
            )
    _, mps, val_acc, var_hist, best_epoch = best
    # Re-save the WINNING attempt: per-epoch checkpointing inside
    # _run_attempt overwrites the same file each attempt, so without this
    # the file on disk after return would hold the LAST attempt's state
    # while the function returns the BEST attempt's -- a later --resume
    # would silently pick up the worse model.
    if checkpoint_path and attempts_run > 1:
        from tensornetworkforml_tpu.utils.checkpoint import (
            save_training_state,
        )

        save_training_state(checkpoint_path, mps, best_epoch)

    try:
        var_hist_arr = np.array(var_hist)
    except ValueError:  # ragged per-epoch step counts (batch warmup)
        var_hist_arr = np.empty(len(var_hist), dtype=object)
        var_hist_arr[:] = var_hist
    return mps, val_acc, var_hist_arr


class Trainer:
    """Thin OO wrapper over ``train_model`` holding hyper-parameters."""

    def __init__(
        self,
        lr: float,
        weight_dec: float = 0.001,
        L2_flag: bool = True,
        debug: bool = False,
        svd_method: str = "svd",
        split_mode: str = "shared",
        renorm_envs: bool = False,
        growth_cap: float = 0.0,
        matmul_precision: str = "default",
        fused: bool = True,
        verbose: bool = True,
        warmup_epochs: int = 0,
        warmup_batch_divisor: Optional[int] = None,
        bond_schedule: Optional[dict] = None,
    ):
        self.lr = lr
        self.weight_dec = weight_dec
        self.L2_flag = L2_flag
        self.debug = debug
        self.svd_method = svd_method
        self.split_mode = split_mode
        self.renorm_envs = renorm_envs
        self.growth_cap = growth_cap
        self.matmul_precision = matmul_precision
        self.fused = fused
        self.verbose = verbose
        self.warmup_epochs = warmup_epochs
        self.warmup_batch_divisor = warmup_batch_divisor
        self.bond_schedule = bond_schedule

    def fit(self, mps: MPS, train_loader, val_loader, n_epochs: int,
            checkpoint_path=None, resume=False):
        return train_model(
            mps,
            train_loader,
            val_loader,
            lr=self.lr,
            n_epochs=n_epochs,
            weight_dec=self.weight_dec,
            L2_flag=self.L2_flag,
            debug=self.debug,
            svd_method=self.svd_method,
            split_mode=self.split_mode,
            renorm_envs=self.renorm_envs,
            growth_cap=self.growth_cap,
            matmul_precision=self.matmul_precision,
            fused=self.fused,
            checkpoint_path=checkpoint_path,
            resume=resume,
            verbose=self.verbose,
            warmup_epochs=self.warmup_epochs,
            warmup_batch_divisor=self.warmup_batch_divisor,
            bond_schedule=self.bond_schedule,
        )
