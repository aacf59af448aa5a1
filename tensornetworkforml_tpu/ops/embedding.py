"""Pixel feature-map embedding.

The reference embeds every pixel ``x`` in [0, 1] as a 2-dim "qubit" feature
``psi(x) = [sin(pi x / 2), cos(pi x / 2)]`` on the host, materialising the
whole ``(B, N, 2)`` array before training (reference
``TensorNetwork/data_generator.py:165-167``).

Here the embedding is a jittable op so XLA fuses it into the first
contraction instead of round-tripping the embedded array through HBM; the
data pipeline ships raw ``(B, N)`` pixels to the device.
"""

from __future__ import annotations

import jax.numpy as jnp


def psi_embed(x: jnp.ndarray) -> jnp.ndarray:
    """Map raw pixels ``(..., N)`` in [0,1] to features ``(..., N, 2)``.

    ``psi(x) = [sin(pi x / 2), cos(pi x / 2)]`` -- the D=2 spin-like local
    feature map of Stoudenmire & Schwab (arXiv:1605.05775, eq. 2), matching
    the reference's ``psi`` (``data_generator.py:165-167``).
    """
    half_pi_x = (jnp.pi / 2.0) * x
    return jnp.stack([jnp.sin(half_pi_x), jnp.cos(half_pi_x)], axis=-1)


def psi_embed_pair(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return ``(sin, cos)`` components separately, shape ``(..., N)`` each.

    Useful for kernels that want to avoid materialising the stacked
    ``(..., N, 2)`` layout.
    """
    half_pi_x = (jnp.pi / 2.0) * x
    return jnp.sin(half_pi_x), jnp.cos(half_pi_x)
