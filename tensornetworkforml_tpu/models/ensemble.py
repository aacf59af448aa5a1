"""Ensemble-of-chains MPS classifier: L independent single-output chains.

Motivation (measured, results/teacher_pm0.json): on the pure entangled
teacher task (``data/teacher.py``, ``proto_mix=0``) every monolithic
student -- greedy two-site DMRG, brick-wall block-Jacobi, and whole-chain
Adam at M=48..64 -- hits an OPTIMIZATION ceiling near 0.86 test although
the task is realizable (Bayes 1.0) and capacity/data were exonerated. The
teacher itself is a direct sum of L independent single-output chains, and
a student with the same factorization (one small chain per class plus a
learned per-class affine head) trains to >= 0.95 on the same data in
minutes: each chain is a tiny well-conditioned problem, and the class
axis becomes a leading vmap/batch axis -- (L, B, m) x (L, m, m) batched
matmuls, MXU-shaped.

This is NOT extra model capacity: ``to_direct_sum`` constructs the
equivalent monolithic label-leg MPS with bond ``L * m`` explicitly
(block-diagonal bulk sites, boundary rows merged, per-class head scale
folded into the label blocks), so the ensemble is a gauge/optimization
restructure inside the same function class the reference implements
(``Network_class.py``), and every existing facility that consumes an
``MPS`` -- serving, checkpoints, reference-pickle export -- works on the
exported form.

No reference counterpart: its report's SVI leaves entangled-label
learnability open; this module is the framework-native answer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from tensornetworkforml_tpu.models.mps import MPS, mps_forward, product_init


@struct.dataclass
class EnsembleMPS:
    """L independent single-output chains + per-class affine head.

    Array leaves: ``sites (L, N, m, D, m)``, ``label_site (L, m, D, 1, m)``,
    ``head_a (L,)``, ``head_b (L,)``. Each chain is a standard label-leg
    MPS with a single output (its class's score); class ``c``'s logit is
    ``head_a[c] * f_c(x) + head_b[c]``.
    """

    sites: jnp.ndarray
    label_site: jnp.ndarray
    head_a: jnp.ndarray
    head_b: jnp.ndarray
    l_pos: int = struct.field(pytree_node=False, default=0)

    @property
    def L(self) -> int:
        return self.sites.shape[0]

    @property
    def N(self) -> int:
        return self.sites.shape[1]

    @property
    def m(self) -> int:
        return self.sites.shape[2]

    @property
    def D(self) -> int:
        return self.sites.shape[3]


def ensemble_init(
    key: jax.Array,
    N: int,
    m: int,
    L: int,
    noise: Optional[float] = None,
    calibration_x: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> EnsembleMPS:
    """L per-class chains via ``product_init(L=1)`` with distinct keys.

    Same init family as the monolithic recipe (per-site data calibration
    keeps each chain's output O(1) at any N); the head starts at the
    identity affine map (a=1, b=0)."""
    keys = jax.random.split(key, L)
    kw = {} if noise is None else {"noise": noise}
    chains = [
        product_init(
            keys[c], N=N, M=m, L=1,
            act_fn="linear", loss_fn="MSE", dtype=dtype,
            calibration_x=calibration_x, **kw,
        )
        for c in range(L)
    ]
    return EnsembleMPS(
        sites=jnp.stack([c.sites for c in chains]),
        label_site=jnp.stack([c.label_site for c in chains]),
        head_a=jnp.ones((L,), dtype),
        head_b=jnp.zeros((L,), dtype),
        l_pos=chains[0].l_pos,
    )


def _template(ens: EnsembleMPS) -> MPS:
    return MPS(
        sites=ens.sites[0], label_site=ens.label_site[0],
        l_pos=ens.l_pos, act_fn="linear", loss_fn="cross_entropy",
    )


def ensemble_forward(ens: EnsembleMPS, phi: jnp.ndarray) -> jnp.ndarray:
    """Class logits ``(L, B)`` for embedded input ``phi (B, N, D)``.

    One vmap over the class axis: the chain contraction's per-site
    ``(B, m) @ (m, m)`` matvecs become ``(L, B, m) @ (L, m, m)`` batched
    matmuls (a single scan over sites, class and batch both mapped)."""
    tmpl = _template(ens)

    def one(sites, label):
        return mps_forward(tmpl.replace(sites=sites, label_site=label),
                           phi)[0]

    f = jax.vmap(one)(ens.sites, ens.label_site)  # (L, B)
    return f * ens.head_a[:, None] + ens.head_b[:, None]


def ensemble_accuracy(ens: EnsembleMPS, phi: jnp.ndarray,
                      y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.argmax(ensemble_forward(ens, phi), 0) == y)


def to_direct_sum(ens: EnsembleMPS) -> MPS:
    """The equivalent monolithic label-leg MPS with bond ``L * m``.

    Construction (label leg at site 0, chain ends closed by the one-hot
    boundary ``e0`` exactly as ``models/mps.py`` prescribes):

    * label site: only its ``e0`` row is read, so row 0 holds every
      class's first-site row in its own bond block, scaled by that
      class's head: ``label'[0, d, c, c*m:(c+1)*m] = a_c * label_c[0, d, 0]``.
    * bulk sites ``1..N-2``: block-diagonal embedding of the chains.
    * last site: only its ``e0`` column is read, so every chain's closing
      column lands in column 0 of its own row block.

    The zero off-blocks are exactly the padded-edge-block invariant the
    trainers preserve, so the exported model trains/serves like any MPS.

    Requires ``head_b == 0``: a per-class constant bias is not exactly
    expressible through the psi feature map (no site vector contracts
    every ``phi(x)`` to 1), so fold biases away (softmax logits are
    shift-invariant only under a SHARED shift) or keep them in the
    ensemble form. Raises ``ValueError`` otherwise.
    """
    import numpy as np

    if float(jnp.max(jnp.abs(ens.head_b))) != 0.0:
        raise ValueError(
            "to_direct_sum needs head_b == 0 (per-class constant bias "
            "is outside the exact MPS function class); retrain with a "
            "bias-free head or keep the ensemble form"
        )
    L, N, m, D, _ = ens.sites.shape
    Mc = L * m
    dtype = ens.sites.dtype
    sites_e = np.asarray(ens.sites)
    label_e = np.asarray(ens.label_site)
    head_a = np.asarray(ens.head_a)
    if ens.l_pos != 0:
        raise ValueError("to_direct_sum supports l_pos == 0 chains")

    sites = np.zeros((N, Mc, D, Mc), dtype=sites_e.dtype)
    # bulk: block-diagonal; sites[0] stays the unused zero slot (the
    # label leg sits there), the LAST site closes on column 0
    for c in range(L):
        sl = slice(c * m, (c + 1) * m)
        sites[1:N - 1, sl, :, sl] = sites_e[c, 1:N - 1]
        sites[N - 1, sl, :, 0] = sites_e[c, N - 1, :, :, 0]

    label_site = np.zeros((Mc, D, L, Mc), dtype=label_e.dtype)
    for c in range(L):
        label_site[0, :, c, c * m:(c + 1) * m] = (
            head_a[c] * label_e[c, 0, :, 0, :]
        )

    return MPS(
        sites=jnp.asarray(sites, dtype),
        label_site=jnp.asarray(label_site, dtype),
        l_pos=0, act_fn="linear", loss_fn="cross_entropy",
    )
