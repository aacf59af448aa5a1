"""Periodic (ring) MPS classifier -- the topology the reference abandoned.

The reference's legacy monolith contains remnants of a circular MPS
(``old_files/TensorNetwork.py:512-513, 652-654``: a commented-out
``partial_trace`` closing the loop) that never worked and was dropped.
Here the ring topology is a live model family: the chain closes on itself,
the forward pass is a trace over the boundary bond,

    f_o(x) = Tr[ A_1(x_1) ... label_o(x_l) ... A_N(x_N) ],

and training runs through the autodiff trainer (``train/autodiff.py``) --
two-site DMRG sweeps need open boundaries, but ``jax.grad`` does not.

The ring forward carries a full (B, M, M) matrix product through a
``lax.scan`` (O(N B M^3) vs the open chain's O(N B M^2)); translation
invariance of the trace lets us start the product right after the label
site, so the label contraction closes the loop in one einsum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.models.mps import MPS
from tensornetworkforml_tpu.ops.embedding import psi_embed


@partial(jax.jit, static_argnames=("l_pos",))
def ring_forward_arrays(sites, label_site, phi, l_pos: int):
    """Un-activated class scores ``(L, B)`` for the ring topology.

    Same array layout as the open chain (``sites (N, M, D, M)``,
    ``label_site (M, D, L, M)``); the slot ``sites[l_pos]`` is unused.
    """
    N, M, D, _ = sites.shape
    B = phi.shape[0]

    # ring order starting after the label: l_pos+1, ..., N-1, 0, ..., l_pos-1
    order = [(l_pos + 1 + k) % N for k in range(N - 1)]
    sites_o = sites[jnp.asarray(order)]
    phi_o = phi[:, jnp.asarray(order), :].transpose(1, 0, 2)  # (N-1, B, D)

    G0 = jnp.broadcast_to(jnp.eye(M, dtype=sites.dtype), (B, M, M))

    def step(G, x):
        A, p = x
        mat = jnp.einsum("ldr,bd->blr", A, p)
        return jnp.einsum("bkl,blr->bkr", G, mat), None

    G, _ = jax.lax.scan(step, G0, (sites_o, phi_o))

    # close the loop through the label site:
    # f[o,b] = sum_{k,r} G[b,k,r] label[r,d,o,k] phi[b,l_pos,d]
    return jnp.einsum("bkr,rdok,bd->ob", G, label_site, phi[:, l_pos, :])


def ring_forward(mps: MPS, phi: jnp.ndarray) -> jnp.ndarray:
    return ring_forward_arrays(
        mps.sites, mps.label_site, phi.astype(mps.dtype), mps.l_pos
    )


def ring_product_init(
    key: jax.Array,
    N: int,
    M: int,
    D: int = 2,
    L: int = 10,
    T: float = 0.1,
    noise: float = 1e-2,
    act_fn: str = "softmax",
    loss_fn: str = "cross_entropy",
    dtype=jnp.float32,
    calibration_x=None,
) -> MPS:
    """Near-identity init for the ring (trace of ~identity products = M).

    Per-site scales include an extra ``M^(1/N)`` factor so the traced
    output is O(1) rather than O(M).
    """
    assert N >= 2
    if calibration_x is not None:
        x = jnp.asarray(calibration_x, dtype=dtype)
        psi_sum = jnp.sin(jnp.pi * x / 2) + jnp.cos(jnp.pi * x / 2)
        c = jnp.maximum(jnp.mean(psi_sum, axis=0), 1e-3)
    else:
        c = jnp.full((N,), 4.0 / jnp.pi, dtype=dtype)
    base = (1.0 / c / (M ** (1.0 / N))).astype(dtype)

    k_sites, k_label = jax.random.split(key)
    eye = jnp.eye(M, dtype=dtype)
    core = jnp.broadcast_to(eye[:, None, :], (M, D, M))
    sites = base[:, None, None, None] * core[None]
    sites = sites + noise * jax.random.normal(k_sites, (N, M, D, M), dtype=dtype)
    sites = sites.at[0].set(jnp.zeros((M, D, M), dtype=dtype))  # label slot

    label_site = base[0] * eye[:, None, None, :]
    label_site = jnp.broadcast_to(label_site, (M, D, L, M)) + (
        noise * jax.random.normal(k_label, (M, D, L, M), dtype=dtype)
    )

    return MPS(
        sites=sites,
        label_site=label_site,
        l_pos=0,
        act_fn=act_fn,
        loss_fn=loss_fn,
        T=T,
    )


def ring_trainer(mps: MPS, cfg=None):
    """An ``AutodiffTrainer`` wired to the ring forward."""
    from tensornetworkforml_tpu.train.autodiff import (
        AutodiffConfig,
        AutodiffTrainer,
    )

    return AutodiffTrainer(
        mps, cfg or AutodiffConfig(), forward_arrays=ring_forward_arrays
    )
