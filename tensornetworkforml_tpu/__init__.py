"""TensorNetworkForML-TPU: a TPU-native MPS tensor-network ML framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``francescovidaich964/TensorNetworkForML`` project (a NumPy implementation of
the Stoudenmire-Schwab "Supervised Learning with Quantum-Inspired Tensor
Networks" algorithm, arXiv:1605.05775): an image classifier whose weight
tensor is a Matrix Product State (MPS) with a label leg, trained with
DMRG-style two-site sweeps (merge -> analytic gradient step -> truncated SVD
split), cf. reference ``TensorNetwork/Network_class.py``.

Design (TPU-first, see SURVEY.md section 7):

* All N MPS sites live in ONE padded array ``(N, M, D, M)`` with one-hot
  boundary vectors, so the ragged edge-site shapes of the reference
  (``Network_class.py:145-148``) disappear and every sweep compiles to a
  single ``lax.scan`` body.
* Contractions are fixed ``jnp.einsum`` patterns (MXU-friendly batched
  matmuls) instead of the reference's permute/broadcast/sum ``contract``
  (``custom_linalg_tools.py:10-87``) which spends >77% of its time on data
  movement.
* Left sweeps are right sweeps under a mirror transform (site order reversed,
  left/right bond indices swapped), halving the compiled surface.
* The batch axis is sharded over a ``jax.sharding.Mesh``; the only collective
  is the psum of the two-site gradient implied by the batch-contraction.
"""

__version__ = "0.1.0"

from tensornetworkforml_tpu.tensor import Tensor, contract, partial_trace
from tensornetworkforml_tpu.models.mps import MPS, mps_forward, mps_init
from tensornetworkforml_tpu.models.network import Network

__all__ = [
    "Tensor",
    "contract",
    "partial_trace",
    "MPS",
    "mps_forward",
    "mps_init",
    "Network",
    "__version__",
]
