"""Pallas TPU kernel: fused psi-embedding + MPS chain contraction.

Computes the right environment of the whole chain -- the inference hot loop
-- in ONE kernel: raw pixels come in, ``sin``/``cos`` embedding happens on
the VPU, and the per-site bond matvecs run on the MXU, with the running
environment held in VMEM for the entire chain. Compared with the XLA scan
this eliminates every intermediate HBM round trip: HBM traffic is exactly
one read of the site stack and one read of the pixels.

The grid is the site axis (TPU grid steps run sequentially on a core, so a
VMEM scratch accumulator carries the environment across sites); the site
stack streams through the pipelined block loader (double-buffered by
Pallas).

Restricted to the D=2 sin/cos feature map (``data_generator.py:165-167``
semantics); callers fall back to the XLA path for other feature maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _right_env_kernel(x_ref, sin_ref, cos_ref, out_ref, v_ref, *, chunk: int):
    """One grid step = ``chunk`` sites, iterated right-to-left.

    Environments are held batch-minor ``(M, B)`` so the per-sample psi
    weights broadcast along lanes (no in-kernel transposes); the site
    stack streams through VMEM ``chunk`` sites at a time (double-buffered
    by the Pallas pipeline), amortising per-grid-step overhead.

    x_ref:    (1, chunk, 1, B) raw pixels for these sites
    sin_ref:  (1, chunk, M, M) site tensors' d=0 (sin) slice
    cos_ref:  (1, chunk, M, M) site tensors' d=1 (cos) slice
    out_ref:  (M, B)           final environment (written on the last step)
    v_ref:    (M, B)           VMEM carry
    """
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        M, B = v_ref.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (M, B), dimension=0)
        v_ref[:, :] = jnp.where(row == 0, 1.0, 0.0).astype(v_ref.dtype)

    dn = (((1,), (0,)), ((), ()))
    for k in reversed(range(chunk)):  # right-to-left within the block
        x = x_ref[0, k, :, :]  # (1, B)
        half_pi_x = (jnp.pi / 2.0) * x
        s = jnp.sin(half_pi_x)  # (1, B) -> broadcasts over rows
        c = jnp.cos(half_pi_x)

        v = v_ref[:, :]  # (M_r, B)
        # one MXU call per site: A_cat (M, 2M) @ [s*v; c*v] (2M, B)
        a_cat = jnp.concatenate(
            [sin_ref[0, k, :, :], cos_ref[0, k, :, :]], axis=1
        )
        w = jnp.concatenate([s * v, c * v], axis=0)  # (2M, B)
        v_ref[:, :] = jax.lax.dot_general(
            a_cat, w, dn, preferred_element_type=jnp.float32
        ).astype(v_ref.dtype)

    @pl.when(i == n_steps - 1)
    def _done():
        out_ref[:, :] = v_ref[:, :]


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def right_env_chain_pallas(
    sites: jnp.ndarray,
    x_raw: jnp.ndarray,
    interpret: bool = False,
    chunk: int = 16,
) -> jnp.ndarray:
    """Right environment of the full chain from RAW pixels.

    ``sites (n, M, 2, M)``, ``x_raw (B, n)`` -> ``(B, M)``; equals
    ``right_env_final_fused(sites, psi_embed(x_raw).transpose(1,0,2), e0)``.

    The chain is padded up to a multiple of ``chunk`` with identity sites
    (``A_cos = I`` contracted with ``psi(0) = (0, 1)``), which leave the
    environment unchanged.
    """
    n, M, D, _ = sites.shape
    assert D == 2, "pallas env kernel implements the D=2 sin/cos map"
    B = x_raw.shape[0]

    pad = (-n) % chunk
    if pad:
        ident = jnp.zeros((pad, M, 2, M), dtype=sites.dtype)
        ident = ident.at[:, :, 1, :].set(jnp.eye(M, dtype=sites.dtype))
        sites = jnp.concatenate([ident, sites], axis=0)  # pad on the LEFT
        x_raw = jnp.concatenate(
            [jnp.zeros((B, pad), dtype=x_raw.dtype), x_raw], axis=1
        )
        n += pad
    n_blocks = n // chunk
    x_t = x_raw.T.reshape(n_blocks, chunk, 1, B)
    sin_b = sites[:, :, 0, :].reshape(n_blocks, chunk, M, M)
    cos_b = sites[:, :, 1, :].reshape(n_blocks, chunk, M, M)

    block4 = lambda i: (n_blocks - 1 - i, 0, 0, 0)
    env_t = pl.pallas_call(
        functools.partial(_right_env_kernel, chunk=chunk),
        grid=(n_blocks,),
        in_specs=[
            # block of sites n_blocks-1-i  (stream right-to-left)
            pl.BlockSpec((1, chunk, 1, B), block4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, M, M), block4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, M, M), block4, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, B), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, B), sites.dtype),
        scratch_shapes=[pltpu.VMEM((M, B), sites.dtype)],
        interpret=interpret,
    )(x_t, sin_b, cos_b)
    return env_t.T


def forward_scores_pallas(
    mps, x_raw: jnp.ndarray, interpret: bool = False, chunk: int = 16
):
    """Class scores ``(L, B)`` from raw pixels via the fused kernel.

    Requires the label leg at site 0 (the training loop's resting state).
    """
    from tensornetworkforml_tpu.ops.contractions import chain_scores
    from tensornetworkforml_tpu.ops.embedding import psi_embed

    if mps.l_pos != 0:
        raise ValueError("pallas forward expects the label leg at site 0")
    x_raw = jnp.asarray(x_raw, dtype=mps.dtype)
    right = right_env_chain_pallas(
        mps.sites[1:], x_raw[:, 1:], interpret, chunk
    )
    x0 = psi_embed(x_raw[:, 0])
    B, M = x_raw.shape[0], mps.M
    e0 = jnp.zeros((B, M), dtype=mps.dtype).at[:, 0].set(1.0)
    return chain_scores(e0, mps.label_site, x0, right)
