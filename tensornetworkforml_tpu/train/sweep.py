"""DMRG-style two-site sweep, compiled as ONE ``lax.scan`` over sites.

This is the training hot path, the TPU-native re-design of the reference's
``sweep`` / ``sweep_step`` / ``update_B`` / ``tensor_svd`` Python loop
(``Network_class.py:384-962``). Semantics are kept exactly:

* one full sweep per batch; environments to the RIGHT of the active pair are
  STALE (precomputed by the batch forward), environments to the LEFT are
  extended incrementally with the just-updated site (reference
  ``Network_class.py:637-652``);
* analytic gradient of the chosen loss o activation, summed over the batch;
* exact L2 regularisation of the FULL MPS via transfer matrices (reference
  ``compute_L2_reg``): right transfer products are precomputed once per sweep
  (sites right of the pair are untouched during a sweep, so this equals the
  reference's per-step recomputation), the left product is carried;
* L1-style gradient clipping (rescale if sum|dB| > sum|B|,
  ``Network_class.py:753-757``), ascent step ``B + lr*dB``;
* truncated SVD split with sqrt(S) shared between factors, fixed rank M.

The padded-uniform site representation (see ``models/mps.py``) removes every
edge/middle special case, so the whole sweep is a single scan body; a LEFT
sweep is a RIGHT sweep on the mirrored chain (site order reversed, bond
indices swapped), which compiles the sweep engine exactly once per direction.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.models.mps import (
    MPS,
    apply_act_fn,
    loss_derivative,
)
from tensornetworkforml_tpu.ops.contractions import (
    boundary_vector,
    chain_scores,
    right_env_stack_fused,
    transfer_append,
    transfer_suffix_stack,
)
from tensornetworkforml_tpu.ops.svd import truncated_svd_split


class SweepConfig(NamedTuple):
    """Static sweep hyper-structure (hashable; part of the jit key).

    ``rank_mode``:
      * ``"fixed"`` (default): truncate every split to bond dimension M --
        standard two-site DMRG truncation, strictly more expressive than the
        reference and static-shape friendly.
      * ``"reference"``: additionally cap each step's rank with the
        reference's evolving bond rule (``Network_class.py:894-910``) for
        bit-parity; the per-step caps are host-computed data (see
        ``train/rank_schedule.py``).
      * ``"adaptive"``: per-bond LIVE rank by spectral energy -- trailing
        singular directions beyond the smallest prefix holding
        ``1 - adaptive_tol`` of the two-site energy are zeroed inside the
        static-M padded representation (the reference's cumulative-
        variance threshold, computed but never used --
        ``Network_class.py:890-891``, ":870 still to be tested" -- made
        real). Requires a spectrum-producing split (``svd``/``cholsvd``);
        per-step live ranks are returned as ``metrics["live_rank"]``.
    """

    act_fn: str = "softmax"
    loss_fn: str = "full_cross_ent"
    L2_flag: bool = True
    svd_method: str = "svd"
    debug: bool = False
    rank_mode: str = "fixed"
    # energy tolerance for rank_mode="adaptive": keep the smallest
    # spectral prefix with >= 1 - adaptive_tol of the two-site energy
    adaptive_tol: float = 1e-4
    # "shared": sqrt(S) on both factors (reference semantics).
    # "canonical": isometric left factor, weight travels with the label core
    # (mixed-canonical gauge; required for large-N float32 stability).
    split_mode: str = "shared"
    # "clip": rescale dB only when sum|dB| > sum|B| (reference,
    #         Network_class.py:753-757).
    # "normalized": ALWAYS rescale dB to sum|B| -- a trust-region-style
    #         step of size lr relative to B, making the dynamics invariant
    #         to the (exponentially shape-dependent) gradient scale.
    update_mode: str = "clip"
    # MXU input precision for every contraction in the sweep:
    # "default" (bf16 passes on TPU -- fastest), "tensorfloat32", or
    # "float32" (3/6-pass, highest accuracy). Long chains accumulate
    # ~1e-2 relative error at "default"; parity tests run on CPU where
    # this knob is a no-op.
    matmul_precision: str = "default"
    # per-step norm transfer into the label core (keeps carried environments
    # at unit mean norm -- required for canonical-split sweeps on chains
    # past N ~ 500 in float32, where the core otherwise overflows)
    renorm_envs: bool = False
    # max fractional growth of sum|B| per step (0 = unlimited, reference
    # behaviour); e.g. 0.005 bounds per-sweep growth to (1.005)^N
    growth_cap: float = 0.0
    # function-preserving gauge rebalance at the END of every sweep:
    # rescale the label core to unit max-abs and spread the factor
    # geometrically across the N-1 live sites (scores unchanged up to
    # rounding). Canonical-mode splits leak ~10%/bond of ridge junk norm
    # into dead directions, parking ~1e9 in the label core after one
    # M=512 sweep while sites shrink to compensate -- site-only env
    # cascades in the NEXT sweep then underflow f32 on TPU and the
    # model annihilates to exact zeros (results/m512_twosweep_tpu.json:
    # sweep 2 in-sweep acc 0.098 on a state whose standalone val is
    # 1.0, then max|label| = 0.0). train_model auto-enables this for
    # fixed-rank canonical sweeps.
    norm_spread: bool = False
    # "xla" (default): the scan body is XLA ops + the configured split.
    # "fused": the ENTIRE two-site step runs as ONE Pallas kernel per
    # scan iteration (ops/kernels/step_kernel.py) -- merge, gradient,
    # clip, update, f recompute, polar-NS split, env extension -- built
    # against the measured ~2.5 us/op XLA latency floor. Requires
    # split_mode="canonical", L2_flag=False, rank_mode="fixed",
    # update_mode="clip", float32; M*D <= 256 (see ops/svd.py's Mosaic
    # note).
    # "hybrid": TWO Mosaic programs per step + one batched XLA matmul
    # (ops/kernels/presplit_kernel.py): kernel A fuses merge, gradient,
    # weight decay, clip, update, f recompute, and the split's sketch +
    # Gram reductions; the existing polar_iterate_pallas kernel runs the
    # serial subspace iteration; R = Q^T B_new lands DIRECTLY in the
    # next step's label layout (free reshape, no transposes). Same
    # constraint family as "fused"; L * I * DM * 12 bytes of VMEM block
    # stacks bound it to M <= 128 at L = 10 (the flagship family).
    engine: str = "xla"
    # Bond-distributed splits (parallel/dist_split.py): "none" keeps the
    # single-program split above; "cholqr"/"polar" run EVERY split of the
    # sweep with the two-site matrix's columns sharded over `dist_mesh`'s
    # model axis (explicit shard_map + psum'd Gram/sketch) -- the
    # bond-parallel training path for large M. Requires
    # split_mode="canonical" and rank_mode="fixed", and the column count
    # L*D*M must divide by the model-axis size.
    dist_split: str = "none"
    # jax.sharding.Mesh used by dist_split (hashable; part of the jit key)
    dist_mesh: object = None
    # False: skip the per-step metric series (accuracy/MAE/|B|/|dB|/|f|
    # argmax-eq-mean chains) -- XLA dead-code-eliminates them, removing
    # ~6 of the ~15 latency-bound ops in the scan body (the reference's
    # var_hist has no equivalent off switch, but production epochs only
    # consume the pre-sweep batch accuracy). Metrics come back as zeros
    # of the right shape so every caller's bookkeeping still works.
    step_metrics: bool = True
    # Large-bond step restructure (train/factored_step.py): compute the
    # whole update and split from the FACTORED form of B_new (merge
    # product + batch outer product) so the (I, L*D*M) two-site tensor is
    # never materialised -- the measured HBM wall at M=512. "auto" uses
    # it exactly when the semantics match (canonical + polar + fixed rank
    # + no L2 + no dist_split) and M*D > 512; "on" forces it for any
    # supported config; "off" keeps the materialising path everywhere.
    factored_update: str = "auto"


def _mirror_sites(sites: jnp.ndarray) -> jnp.ndarray:
    """Reverse the chain and swap left/right bond legs: (n,l,d,r)->(~n,r,d,l)."""
    return jnp.flip(sites, axis=0).transpose(0, 3, 2, 1)


def _mirror_label(label_site: jnp.ndarray) -> jnp.ndarray:
    """(l,d,o,r) -> (r,d,o,l)."""
    return label_site.transpose(3, 1, 2, 0)


def two_site_update(
    label_site: jnp.ndarray,
    A2: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    l_env: jnp.ndarray,
    r_env: jnp.ndarray,
    E2: jnp.ndarray,
    r2_step: jnp.ndarray,
    y_onehot: jnp.ndarray,
    f: jnp.ndarray,
    lr,
    weight_dec,
    rank,
    T: float,
    cfg: SweepConfig,
):
    """ONE two-site DMRG update (the reference's ``sweep_step`` +
    ``update_B`` + ``tensor_svd``, ``Network_class.py:440-763``), as a pure
    function over explicit environments.

    Inputs (right-sweep orientation; the mirrored chain handles left
    sweeps): the label-carrying site ``(M,D,L,M)``, its right neighbour
    ``A2 (M,D,M)``, the two site inputs ``x1/x2 (B,D)``, carried left
    environment ``l_env (B,M)`` and left L2 transfer product ``E2 (M,M)``,
    STALE right environment ``r_env (B,M)`` and right transfer product
    ``r2_step (M,M)``, one-hot targets ``(L,B)`` and the previous step's
    network output ``f (L,B)``.

    Returns ``(A_left, new_label_site, new_l_env, new_E2, f_new, metrics)``.
    This is the scan body of ``sweep_once``; it is exposed for step-level
    experimentation and custom schedules.
    """
    M, D, L, _ = label_site.shape
    dtype = label_site.dtype

    from tensornetworkforml_tpu.train.factored_step import (
        factored_supported,
        two_site_update_factored,
    )

    if cfg.factored_update == "on" and not factored_supported(cfg, M, D):
        raise ValueError(
            "factored_update='on' requires split_mode='canonical', "
            "svd_method='polar', L2_flag=False, rank_mode='fixed', "
            "dist_split='none'"
        )
    if cfg.factored_update != "off" and factored_supported(cfg, M, D) and (
        cfg.factored_update == "on" or M * D > 512
    ):
        A_left, label_new, l_env_new, f_new, metrics = (
            two_site_update_factored(
                label_site, A2, x1, x2, l_env, r_env, y_onehot, f,
                lr, weight_dec, T, cfg,
            )
        )
        return A_left, label_new, l_env_new, E2, f_new, metrics

    # merge the active pair: B[a,i,o,j,c] (left,d1,label,d2,right)
    B_t = jnp.einsum("aiok,kjc->aiojc", label_site, A2)

    # metrics on the CURRENT output (pre-update), as the reference does
    f_act = apply_act_fn(f, cfg.act_fn, T)
    zero = jnp.zeros((), dtype=dtype)
    if cfg.step_metrics:
        y_pred = jnp.argmax(f_act, axis=0)
        y_true = jnp.argmax(y_onehot, axis=0)
        acc = jnp.mean((y_pred == y_true).astype(dtype))
        mae = jnp.mean(jnp.abs(y_onehot - f_act))
    else:
        acc = mae = zero

    # analytic gradient: dB[a,i,o,j,c] = sum_b loss_der[o,b] *
    #   l_env[b,a] x1[b,i] x2[b,j] r_env[b,c]
    # Folding loss_der into the RIGHT factor (w_t) makes the batch
    # contraction a single dot whose natural output order is already
    # (a,i,o,j,c) -- the previous (loss_der x left_part) association
    # produced (o,a,i,j,c) and forced XLA to transpose the full-size
    # deltaB (42 MB at M=512 L=10), pure HBM traffic.
    loss_der = loss_derivative(f_act, y_onehot, cfg.loss_fn, cfg.act_fn, T)
    left_part = jnp.einsum("ba,bi->bai", l_env, x1)  # (B,M,D)
    right_part = jnp.einsum("bj,bc->bjc", x2, r_env)  # (B,D,M)
    w_t = jnp.einsum("ob,bjc->bojc", loss_der, right_part)  # (B,L,D,M)
    deltaB = jnp.einsum("bai,bojc->aiojc", left_part, w_t)

    # regularisation (exact L2 of the whole MPS, or plain decay)
    if cfg.L2_flag:
        deriv = jnp.einsum("aA,AiojC,Cc->aiojc", E2, B_t, r2_step)
        l2_loss = weight_dec * jnp.sum(B_t * deriv)
        l2_grad = 2.0 * weight_dec * deriv
    else:
        l2_loss = jnp.zeros((), dtype=dtype)
        l2_grad = weight_dec * B_t
    deltaB = deltaB - l2_grad

    sum_abs_dB = jnp.sum(jnp.abs(deltaB))  # recorded pre-clip (ref :742)

    s_B = jnp.sum(jnp.abs(B_t))
    s_dB = sum_abs_dB
    if cfg.update_mode == "normalized":
        # trust-region step: |dB| always == |B| before the lr factor
        deltaB = deltaB * jnp.where(
            s_dB > 0, s_B / jnp.maximum(s_dB, 1e-30), 0.0
        )
    else:
        # L1 gradient clipping (Network_class.py:753-757)
        deltaB = deltaB * jnp.where(s_dB > s_B, s_B / s_dB, 1.0)

    # ascent step (loss derivatives are defined so ascent == descent)
    B_new = B_t + lr * deltaB
    if cfg.growth_cap > 0:
        # long-chain stabiliser: cap the per-step norm growth of B. Clipped
        # updates otherwise compound |B| by up to (1+lr) per step --
        # e^(lr*N) per sweep, which overflows float32 near N~800 even under
        # the norm-transfer gauge.
        s_new = jnp.sum(jnp.abs(B_new))
        cap = (1.0 + cfg.growth_cap) * s_B
        B_new = B_new * jnp.where(
            s_new > cap, cap / jnp.maximum(s_new, 1e-30), 1.0
        )

    # recompute the network output with the updated B (stale right env)
    f_new = jnp.einsum("bai,aiojc,bjc->ob", left_part, B_new, right_part)

    # split back: rows (a,i), cols (o,j,c); truncate to bond dim M
    bmat = B_new.reshape(M * D, L * D * M)
    if bmat.dtype == jnp.bfloat16:  # no bf16 SVD; split in f32
        bmat = bmat.astype(jnp.float32)
    keep = rank if cfg.rank_mode == "reference" else None
    atol = 0.0
    if cfg.rank_mode == "adaptive":
        if cfg.svd_method not in ("svd", "cholsvd"):
            raise ValueError(
                "rank_mode='adaptive' needs a spectrum-producing split "
                "(svd_method='svd' or 'cholsvd'), got "
                f"{cfg.svd_method!r}"
            )
        if cfg.dist_split != "none":
            raise ValueError("rank_mode='adaptive' requires dist_split='none'")
        atol = cfg.adaptive_tol
    if cfg.dist_split != "none":
        # bond-distributed split: columns of the (I, L*D*M) two-site
        # matrix sharded over the mesh's model axis, Gram/sketch psum'd
        # (parallel/dist_split.py). The right factor -- the new label
        # core -- comes back column-sharded, so the label core's big legs
        # stay distributed through the whole sweep.
        from tensornetworkforml_tpu.parallel.dist_split import (
            distributed_cholqr_split,
            distributed_polar_split,
        )

        if cfg.split_mode != "canonical" or keep is not None:
            raise ValueError(
                "dist_split requires split_mode='canonical' and "
                "rank_mode='fixed'"
            )
        if cfg.dist_mesh is None:
            raise ValueError("dist_split set but dist_mesh is None")
        dist_fn = {
            "cholqr": distributed_cholqr_split,
            "polar": distributed_polar_split,
        }[cfg.dist_split]
        left_flat, right_flat = dist_fn(bmat, M, cfg.dist_mesh)
    else:
        left_flat, right_flat = truncated_svd_split(
            bmat, M, cfg.svd_method, keep=keep, split_mode=cfg.split_mode,
            adaptive_tol=atol,
        )
    A_left = left_flat.reshape(M, D, M).astype(dtype)
    label_new = (
        right_flat.reshape(M, L, D, M).transpose(0, 2, 1, 3).astype(dtype)
    )

    # extend the carried left environment / left transfer product with
    # the UPDATED site (reference Network_class.py:637-652, 1017-1029)
    l_env_new = jnp.einsum("bai,aim->bm", left_part, A_left)

    if cfg.renorm_envs:
        # Norm transfer (function-preserving gauge): scale the new site so
        # the carried environment keeps unit mean norm, and compensate in
        # the label core. Without this, canonical splits concentrate ALL
        # chain scale in the label core, which grows like 1/|env| ~ e^N
        # along the sweep and OVERFLOWS float32 near N~800; with it, every
        # environment and the core stay O(1) at any chain length.
        g = 1.0 / jnp.maximum(
            jnp.mean(jnp.linalg.norm(l_env_new, axis=1)), 1e-30
        )
        A_left = A_left * g
        l_env_new = l_env_new * g
        label_new = label_new / g

    E2_new = transfer_append(E2, A_left) if cfg.L2_flag else E2

    # |.| totals are recorded as SUMS; sweep_once divides by the ragged
    # element count so means match the reference's ragged tensors.
    if cfg.step_metrics:
        metrics = {
            "accuracy": acc,
            "MAE": mae,
            "sum_abs_B": s_B,
            "sum_abs_deltaB": sum_abs_dB,
            "mean_abs_f": jnp.mean(jnp.abs(f)),
            "L2_loss": l2_loss,
            "sum_abs_L2_grad": jnp.sum(jnp.abs(l2_grad)),
        }
    else:  # s_B/s_dB still feed the clip; everything else is DCE'd
        metrics = {
            "accuracy": zero, "MAE": zero, "sum_abs_B": zero,
            "sum_abs_deltaB": zero, "mean_abs_f": zero,
            "L2_loss": zero, "sum_abs_L2_grad": zero,
        }
    if cfg.rank_mode == "adaptive":
        # per-bond live rank: rows of the right factor that survived the
        # energy threshold (the adaptive observability the reference's
        # dead code never delivered)
        metrics["live_rank"] = jnp.sum(
            (jnp.sum(right_flat * right_flat, axis=1) > 0).astype(dtype)
        )
    return A_left, label_new, l_env_new, E2_new, f_new, metrics


def _spread_label_norm(new_sites, label_final):
    """Gauge rebalance: label core to unit max-abs, the norm spread
    geometrically over the N-1 live sites (slot N-1 is the zero label
    slot; zeros stay exactly zero under the scalar multiply). The
    network function is exactly preserved: scores pick up only the
    rounding of one scalar multiply per tensor."""
    dtype = new_sites.dtype
    # scalar math at f32-or-better even when the model is bf16
    sdt = jnp.promote_types(dtype, jnp.float32)
    n = jnp.max(jnp.abs(label_final)).astype(sdt)
    safe = jnp.where(n > 0, n, jnp.asarray(1.0, sdt))
    n_live = new_sites.shape[0] - 1
    c = jnp.exp(jnp.log(safe) / n_live).astype(dtype)
    return new_sites * c, label_final / safe.astype(dtype)


def _sweep_right_arrays(
    sites: jnp.ndarray,
    label_site: jnp.ndarray,
    phi: jnp.ndarray,
    y_onehot: jnp.ndarray,
    lr: jnp.ndarray,
    weight_dec: jnp.ndarray,
    ranks: jnp.ndarray,
    T: float,
    cfg: SweepConfig,
):
    """One full right sweep (label leg moves 0 -> N-1). Returns
    ``(new_sites, new_label_site, f_first, f_final, metrics)``.

    ``metrics`` holds per-step series of length N-1 (accuracy, MAE, and the
    debug series of the reference's ``var_hist``, ``Network_class.py:739-750``).
    """
    N, M, D, _ = sites.shape
    L = label_site.shape[2]
    B_sz = phi.shape[0]
    dtype = sites.dtype
    e0 = boundary_vector(M, dtype=dtype)

    # --- per-batch precomputation (the reference's `forward` + env caches) ---
    # suffix environments with the psi-contraction fused (no (N,B,M,M)
    # intermediate); index 0 unused (the label sits there)
    phi_t = phi.transpose(1, 0, 2)  # (N, B, D)
    r_envs = right_env_stack_fused(sites, phi_t, e0)  # (N+1,B,M), stale
    f0 = chain_scores(
        jnp.broadcast_to(e0, (B_sz, M)), label_site, phi[:, 0, :], r_envs[1]
    )
    if cfg.L2_flag:
        r2 = transfer_suffix_stack(sites, e0)  # (N+1,M,M), exact: right sites
        # are untouched during a right sweep.
    else:
        r2 = jnp.zeros((N + 1, M, M), dtype=dtype)

    if cfg.engine == "fused":
        # whole-step Pallas engine: one kernel per scan iteration
        import jax as _jax

        from tensornetworkforml_tpu.ops.kernels.step_kernel import (
            label_to_kernel_layout,
            two_site_step_pallas,
        )

        if cfg.L2_flag or cfg.split_mode != "canonical" or (
            cfg.rank_mode != "fixed" or cfg.update_mode != "clip"
        ):
            raise ValueError(
                "engine='fused' requires split_mode='canonical', "
                "L2_flag=False, rank_mode='fixed', update_mode='clip'"
            )
        interp = _jax.default_backend() != "tpu"
        y1h32 = y_onehot.astype(jnp.float32)

        def fstep(carry, x):
            lab, l_env, f = carry
            x1, x2, A2, r_env = x
            a_left, lab_new, l_env_new, f_new, metr = two_site_step_pallas(
                lab, A2, x1, x2, l_env, r_env, y1h32, f, lr, weight_dec,
                act_fn=cfg.act_fn, loss_fn=cfg.loss_fn, T=T,
                renorm_envs=cfg.renorm_envs, growth_cap=cfg.growth_cap,
                interpret=interp,
            )
            # (L, M, D*M) -> (L, M*D, M): same contiguous (a', i', k')
            lab_new = lab_new.reshape(L, M * D, M)
            metrics = {
                "accuracy": metr[0, 0].astype(dtype),
                "MAE": metr[0, 1].astype(dtype),
                "sum_abs_B": metr[0, 2].astype(dtype),
                "sum_abs_deltaB": metr[0, 3].astype(dtype),
                "mean_abs_f": jnp.mean(jnp.abs(f)),
                "L2_loss": jnp.zeros((), dtype=dtype),
                "sum_abs_L2_grad": jnp.zeros((), dtype=dtype),
            }
            return (lab_new, l_env_new, f_new), (
                a_left.reshape(M, D, M).astype(dtype), metrics
            )

        finit = (
            label_to_kernel_layout(label_site.astype(jnp.float32)),
            jnp.broadcast_to(e0, (B_sz, M)).astype(jnp.float32),
            f0.astype(jnp.float32),
        )
        fxs = (
            phi_t[:-1].astype(jnp.float32),
            phi_t[1:].astype(jnp.float32),
            sites[1:].astype(jnp.float32),
            r_envs[2:].astype(jnp.float32),
        )
        (lab_fin, _, f_final), (A_lefts, metrics) = jax.lax.scan(
            fstep, finit, fxs
        )
        from tensornetworkforml_tpu.ops.kernels.step_kernel import (
            label_from_kernel_layout,
        )

        label_final = label_from_kernel_layout(
            lab_fin.reshape(L, M, D * M)
        ).astype(dtype)
        new_sites = jnp.concatenate(
            [A_lefts, jnp.zeros((1, M, D, M), dtype=dtype)], axis=0
        )
        if cfg.norm_spread:
            new_sites, label_final = _spread_label_norm(new_sites, label_final)
        return new_sites, label_final, f0, f_final, metrics

    if cfg.engine == "hybrid":
        # pre-split kernel + iterate kernel + one batched R matmul
        # (ops/kernels/presplit_kernel.py has the layout story)
        from tensornetworkforml_tpu.ops.kernels.polar_split import (
            polar_iterate_pallas,
        )
        from tensornetworkforml_tpu.ops.kernels.presplit_kernel import (
            two_site_presplit_pallas,
        )
        from tensornetworkforml_tpu.ops.svd import _rangefinder_omega

        if cfg.L2_flag or cfg.split_mode != "canonical" or (
            cfg.rank_mode != "fixed" or cfg.update_mode != "clip"
            or cfg.dist_split != "none"
        ):
            raise ValueError(
                "engine='hybrid' requires split_mode='canonical', "
                "L2_flag=False, rank_mode='fixed', update_mode='clip', "
                "dist_split='none'"
            )
        if M * D > 256:
            raise ValueError(
                "engine='hybrid' single-block kernel requires M*D <= 256 "
                "(VMEM block stacks); larger bonds use the streaming "
                "gramfree split on the xla engine"
            )
        interp = jax.default_backend() != "tpu"
        f32 = jnp.float32
        om = _rangefinder_omega(L * D * M, M, f32).reshape(L, D * M, M)
        y1h32 = y_onehot.astype(f32)
        lr32 = lr.astype(f32)
        wd32 = weight_dec.astype(f32)
        # (a,i,o,k) -> (o, (a,i), k): the kernel-carry layout
        lab0 = (
            label_site.astype(f32)
            .transpose(2, 0, 1, 3)
            .reshape(L, M * D, M)
        )

        def hstep(carry, x):
            lab, l_env, f = carry
            x1, x2, a2m, r_env = x
            bnew, y0, g, f_new, left_part, stats = two_site_presplit_pallas(
                lab, a2m, x1, x2, l_env, r_env, y1h32, f, om, lr32, wd32,
                act_fn=cfg.act_fn, loss_fn=cfg.loss_fn, T=T,
                with_gram=True, interpret=interp,
            )
            qf = polar_iterate_pallas(
                y0, g, stats[0, 2].reshape(1, 1), interpret=interp
            )
            # R per label block -> EXACTLY the next step's carry layout
            r = jnp.einsum("rm,Lrs->Lms", qf, bnew)
            if cfg.growth_cap > 0:
                cap = (1.0 + cfg.growth_cap) * stats[0, 0]
                gamma = jnp.where(
                    stats[0, 3] > cap,
                    cap / jnp.maximum(stats[0, 3], 1e-30), 1.0,
                )
                r = r * gamma
                f_new = f_new * gamma
            l_env_new = left_part @ qf
            a_left = qf
            if cfg.renorm_envs:
                gn = 1.0 / jnp.maximum(
                    jnp.mean(jnp.linalg.norm(l_env_new, axis=1)), 1e-30
                )
                a_left = a_left * gn
                l_env_new = l_env_new * gn
                r = r / gn
            lab_new = r.reshape(L, M * D, M)  # free view, see kernel doc
            metrics = {
                "accuracy": stats[0, 4].astype(dtype),
                "MAE": stats[0, 5].astype(dtype),
                "sum_abs_B": stats[0, 0].astype(dtype),
                "sum_abs_deltaB": stats[0, 1].astype(dtype),
                "mean_abs_f": stats[0, 6].astype(dtype),
                "L2_loss": jnp.zeros((), dtype=dtype),
                "sum_abs_L2_grad": jnp.zeros((), dtype=dtype),
            }
            return (lab_new, l_env_new, f_new), (
                a_left.reshape(M, D, M).astype(dtype), metrics
            )

        hinit = (
            lab0,
            jnp.broadcast_to(e0, (B_sz, M)).astype(f32),
            f0.astype(f32),
        )
        hxs = (
            phi_t[:-1].astype(f32),
            phi_t[1:].astype(f32),
            sites[1:].astype(f32).reshape(N - 1, M, D * M),
            r_envs[2:].astype(f32),
        )
        (lab_fin, _, f_final), (A_lefts, metrics) = jax.lax.scan(
            hstep, hinit, hxs
        )
        label_final = (
            lab_fin.reshape(L, M, D, M).transpose(1, 2, 0, 3).astype(dtype)
        )
        new_sites = jnp.concatenate(
            [A_lefts, jnp.zeros((1, M, D, M), dtype=dtype)], axis=0
        )
        if cfg.norm_spread:
            new_sites, label_final = _spread_label_norm(new_sites, label_final)
        return new_sites, label_final, f0, f_final.astype(dtype), metrics

    xs = (
        phi_t[:-1],  # x1s  (N-1,B,D)
        phi_t[1:],  # x2s  (N-1,B,D)
        sites[1:],  # A2s  (N-1,M,D,M): reads are always pre-sweep sites
        r_envs[2:],  # stale right environments, step l uses r_envs[l+2]
        r2[2:],  # stale right transfer products
        ranks,  # per-step SVD rank caps
    )

    def step(carry, x):
        label, l_env, E2, f = carry
        x1, x2, A2, r_env, r2_step, rank = x
        A_left, label_new, l_env_new, E2_new, f_new, metrics = two_site_update(
            label, A2, x1, x2, l_env, r_env, E2, r2_step, y_onehot, f,
            lr, weight_dec, rank, T, cfg,
        )
        return (label_new, l_env_new, E2_new, f_new), (A_left, metrics)

    init = (
        label_site,
        jnp.broadcast_to(e0, (B_sz, M)),
        jnp.outer(e0, e0),
        f0,
    )
    (label_final, _, _, f_final), (A_lefts, metrics) = jax.lax.scan(
        step, init, xs
    )

    # slots 0..N-2 hold the new left factors; the label now sits at N-1
    new_sites = jnp.concatenate(
        [A_lefts, jnp.zeros((1, M, D, M), dtype=dtype)], axis=0
    )
    if cfg.norm_spread:
        new_sites, label_final = _spread_label_norm(new_sites, label_final)
    return new_sites, label_final, f0, f_final, metrics


@partial(jax.jit, static_argnames=("T", "cfg", "left_dir"))
def _sweep_jit(
    sites, label_site, phi, y_onehot, lr, weight_dec, ranks, T, cfg, left_dir
):
    if cfg.matmul_precision != "default":
        with jax.default_matmul_precision(cfg.matmul_precision):
            return _sweep_jit_body(
                sites, label_site, phi, y_onehot, lr, weight_dec, ranks, T,
                cfg, left_dir,
            )
    return _sweep_jit_body(
        sites, label_site, phi, y_onehot, lr, weight_dec, ranks, T, cfg,
        left_dir,
    )


def _sweep_jit_body(
    sites, label_site, phi, y_onehot, lr, weight_dec, ranks, T, cfg, left_dir
):
    if left_dir:
        new_s, new_l, f0, f_fin, m = _sweep_right_arrays(
            _mirror_sites(sites),
            _mirror_label(label_site),
            jnp.flip(phi, axis=1),
            y_onehot,
            lr,
            weight_dec,
            ranks,
            T,
            cfg,
        )
        return _mirror_sites(new_s), _mirror_label(new_l), f0, f_fin, m
    return _sweep_right_arrays(
        sites, label_site, phi, y_onehot, lr, weight_dec, ranks, T, cfg
    )


def sweep_once(
    mps: MPS,
    phi: jnp.ndarray,
    y_onehot: jnp.ndarray,
    lr: float,
    weight_dec: float,
    cfg: SweepConfig = None,
    bond_profile=None,
):
    """One full sweep in the direction implied by ``mps.l_pos``.

    The label leg must sit at a chain end (as in the reference, whose
    ``forward`` requires it, ``Network_class.py:257``). Returns
    ``(new_mps, f_first, f_final, metrics)`` where ``f_first`` is the batch
    forward before any update (what the reference's training loop uses for
    the pre-sweep accuracy) and ``metrics`` are per-step series of length N-1.

    In ``rank_mode="reference"`` the per-step SVD rank caps follow the
    reference's bond recurrence, seeded from ``bond_profile`` (list of N-1
    bond dims; inferred from the zero structure if omitted); the evolved
    profile is returned as ``metrics["bond_profile"]``.
    """
    if cfg is None:
        cfg = SweepConfig(act_fn=mps.act_fn, loss_fn=mps.loss_fn)
    left_dir = mps.l_pos == mps.N - 1
    if not left_dir and mps.l_pos != 0:
        raise ValueError(
            f"sweep requires the label leg at a chain end, got l_pos={mps.l_pos}"
        )

    if cfg.rank_mode == "reference":
        from tensornetworkforml_tpu.train.rank_schedule import (
            effective_bond_profile,
            reference_rank_schedule,
        )

        if bond_profile is None:
            bond_profile = effective_bond_profile(mps)
        ranks_np, counts_np, new_profile = reference_rank_schedule(
            bond_profile, mps.N, mps.D, mps.L, left_dir
        )
        ranks = jnp.asarray(ranks_np)
    else:
        new_profile = None
        counts_np = np.full(
            (mps.N - 1,), mps.M * mps.D * mps.L * mps.D * mps.M, dtype=np.int64
        )
        ranks = jnp.full((mps.N - 1,), mps.M, dtype=jnp.int32)

    lr = jnp.asarray(lr, dtype=mps.dtype)
    weight_dec = jnp.asarray(weight_dec, dtype=mps.dtype)
    new_sites, new_label, f0, f_fin, metrics = _sweep_jit(
        mps.sites,
        mps.label_site,
        phi.astype(mps.dtype),
        y_onehot.astype(mps.dtype),
        lr,
        weight_dec,
        ranks,
        mps.T,
        cfg,
        left_dir,
    )
    # ragged-equivalent means for the reference's debug series
    metrics = dict(metrics)
    counts = jnp.asarray(counts_np, dtype=mps.dtype)
    metrics["mean_abs_B"] = metrics.pop("sum_abs_B") / counts
    metrics["mean_abs_deltaB"] = metrics.pop("sum_abs_deltaB") / counts
    metrics["mean_abs_L2_grad"] = metrics.pop("sum_abs_L2_grad") / counts
    if new_profile is not None:
        metrics["bond_profile"] = new_profile
    new_mps = mps.replace(
        sites=new_sites,
        label_site=new_label,
        l_pos=0 if left_dir else mps.N - 1,
    )
    return new_mps, f0, f_fin, metrics


def train_batch(
    mps: MPS,
    x_raw: jnp.ndarray,
    y: jnp.ndarray,
    lr: float,
    weight_dec: float,
    cfg: SweepConfig = None,
):
    """Embed + forward + full sweep on one batch of RAW pixels ``(B, N)``.

    Returns ``(new_mps, batch_accuracy, metrics)`` with ``batch_accuracy``
    computed BEFORE the sweep, matching the reference training loop
    (``Network_class.py:327-333``).
    """
    from tensornetworkforml_tpu.ops.embedding import psi_embed

    phi = psi_embed(jnp.asarray(x_raw, dtype=mps.dtype))
    L = mps.L
    y = jnp.asarray(y)
    y_onehot = jax.nn.one_hot(y, L, dtype=mps.dtype).T  # (L, B)
    new_mps, f0, _, metrics = sweep_once(mps, phi, y_onehot, lr, weight_dec, cfg)
    y_pred = jnp.argmax(f0, axis=0)
    batch_acc = jnp.mean((y_pred == y).astype(mps.dtype))
    return new_mps, batch_acc, metrics
