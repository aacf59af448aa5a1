"""Production batch inference: fixed-shape compiled predictor.

Serving-side counterpart of the training stack: one compiled program per
(padded) batch shape, raw pixels in / labels out, on-device psi embedding,
optional batch sharding over a device mesh. The reference's equivalent is
re-running ``Network.forward`` per test batch from a pickled model
(``test_diagonals.py:60-79``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.models.boundary import (
    BoundaryMPS,
    boundary_forward_arrays,
)
from tensornetworkforml_tpu.models.mps import MPS, _forward_arrays, apply_act_fn
from tensornetworkforml_tpu.ops.embedding import psi_embed


class Predictor:
    """Compiled fixed-shape batch predictor for a trained MPS.

    Serves BOTH model families: the traveling-label ``MPS`` and the
    boundary-label ``BoundaryMPS`` (the one-site / brick-wall trainers'
    family). Arbitrary request sizes are served by padding up to the
    configured ``batch_size`` (static shapes -> one compilation); larger
    requests are chunked. With a ``mesh``, inputs are sharded over its
    ``data`` axis.
    """

    def __init__(
        self,
        mps: MPS,
        batch_size: int = 256,
        mesh=None,
        activation: bool = False,
        use_pallas: Optional[bool] = None,
    ):
        self.mps = mps
        self.batch_size = int(batch_size)
        self.activation = activation
        self._mesh = mesh
        self._is_boundary = isinstance(mps, BoundaryMPS)
        if mesh is not None:
            from tensornetworkforml_tpu.parallel.mesh import (
                batch_sharding,
                replicated,
            )

            if self._is_boundary:
                sh = replicated(mesh)
                self.mps = mps.replace(
                    sites=jax.device_put(mps.sites, sh),
                    w=jax.device_put(mps.w, sh),
                )
            else:
                from tensornetworkforml_tpu.parallel.mesh import (
                    replicate_params,
                )

                self.mps = replicate_params(mesh, mps)
            self._x_sharding = batch_sharding(mesh, 0, ndim=2)
        else:
            self._x_sharding = None

        if self._is_boundary:
            if use_pallas:
                raise ValueError(
                    "use_pallas=True is not supported for the boundary-"
                    "label family (the fused kernel serves the traveling-"
                    "label MPS only); omit it or pass use_pallas=False"
                )
            # boundary family: scores close on the output projection w
            @jax.jit
            def _scores_b(sites, w, x_raw):
                f = boundary_forward_arrays(sites, w, psi_embed(x_raw))
                if activation:
                    f = apply_act_fn(f, mps.act_fn, mps.T)
                return f

            self._scores_fn = _scores_b
            self.use_pallas = False
            return

        l_pos = self.mps.l_pos

        # The fused Pallas embed+chain kernel is the single-chip TPU
        # default. Re-measured round 5 (results/m512_profile.json,
        # in-jit loop + host-fetch sync, N=196/M=64): 554 vs 660 us at
        # B=256, 581 vs 778 at B=2048, and 753 vs 2213 at B=8192 --
        # faster at every batch size, 2.9x at serving scale. (The round-4
        # bench's one-off 1092-vs-686 reading did not reproduce -- tunnel
        # noise.) It also contracts at full f32 precision where the XLA
        # path defaults to bf16 MXU passes (~1e-2..1e-1 relative drift
        # over long chains).
        if use_pallas is None:
            # mesh serving defaults to the XLA path (GSPMD-partitioned);
            # the shard_map'd kernel below is opt-in via use_pallas=True
            use_pallas = (
                mesh is None
                and jax.default_backend() == "tpu"
                and self.mps.D == 2
                and l_pos == 0
            )
        self.use_pallas = bool(use_pallas)

        if self.use_pallas:
            from tensornetworkforml_tpu.ops.kernels.env_scan import (
                forward_scores_pallas,
            )

            this_mps = self.mps
            interp = jax.default_backend() != "tpu"

            if mesh is not None:
                # Pallas x GSPMD: batch-shard the fused kernel with
                # shard_map -- each device runs the whole-chain kernel on
                # its batch shard with replicated parameters; no
                # collectives needed (the forward is batch-local).
                from jax.sharding import PartitionSpec as P

                from tensornetworkforml_tpu.parallel.mesh import DATA_AXIS

                @jax.jit
                def _scores(sites, label_site, x_raw):
                    @partial(
                        jax.shard_map,
                        mesh=mesh,
                        in_specs=(P(), P(), P(DATA_AXIS, None)),
                        out_specs=P(None, DATA_AXIS),
                        check_vma=False,  # pallas outputs carry no vma
                    )
                    def _local(s, l, x_loc):
                        return forward_scores_pallas(
                            this_mps.replace(sites=s, label_site=l),
                            x_loc, interpret=interp,
                        )

                    f = _local(sites, label_site, x_raw)
                    if activation:
                        f = apply_act_fn(f, mps.act_fn, mps.T)
                    return f

            else:

                @jax.jit
                def _scores(sites, label_site, x_raw):
                    f = forward_scores_pallas(
                        this_mps.replace(sites=sites, label_site=label_site),
                        x_raw, interpret=interp,
                    )
                    if activation:
                        f = apply_act_fn(f, mps.act_fn, mps.T)
                    return f

        else:

            @jax.jit
            def _scores(sites, label_site, x_raw):
                phi = psi_embed(x_raw)
                f = _forward_arrays(sites, label_site, phi, l_pos)
                if activation:
                    f = apply_act_fn(f, mps.act_fn, mps.T)
                return f

        self._scores_fn = _scores

    @classmethod
    def from_checkpoint(cls, path: str, **kwargs) -> "Predictor":
        from tensornetworkforml_tpu.utils.checkpoint import (
            load_any_checkpoint,
            mps_from_reference_pickle,
        )

        if path.endswith(".dat"):
            mps = mps_from_reference_pickle(path, dtype=jnp.float32)
        else:
            mps = load_any_checkpoint(path, dtype=jnp.float32)
        return cls(mps, **kwargs)

    def warmup(self) -> None:
        """Trigger compilation before serving traffic."""
        x = np.zeros((self.batch_size, self.mps.N), dtype=np.float32)
        jax.block_until_ready(self._chunk_scores(x))

    def _chunk_scores(self, x_chunk: np.ndarray):
        x_dev = jnp.asarray(x_chunk, dtype=self.mps.dtype)
        if self._x_sharding is not None:
            x_dev = jax.device_put(x_dev, self._x_sharding)
        second = self.mps.w if self._is_boundary else self.mps.label_site
        return self._scores_fn(self.mps.sites, second, x_dev)

    def scores(self, x_raw: np.ndarray) -> np.ndarray:
        """Class scores ``(n, L)`` for raw pixels ``(n, N)`` (any n)."""
        x_raw = np.asarray(x_raw, dtype=np.float32).reshape(len(x_raw), -1)
        n = len(x_raw)
        outs = []
        for lo in range(0, n, self.batch_size):
            chunk = x_raw[lo : lo + self.batch_size]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, chunk.shape[1]), dtype=np.float32)]
                )
            f = np.asarray(self._chunk_scores(chunk)).T  # (B, L)
            outs.append(f[: self.batch_size - pad if pad else None])
        return np.concatenate(outs, axis=0)[:n]

    def predict(self, x_raw: np.ndarray) -> np.ndarray:
        """Predicted labels ``(n,)``."""
        return self.scores(x_raw).argmax(axis=1)
