"""Large-M output-scale guard in product_init (ROADMAP item 7b).

The noise term of the near-identity init random-walks the environment
amplitude like sqrt(1 + noise^2 * M * D) per site, so at large M*D the
un-activated output compounds to 30-200x instead of O(1) (measured on TPU:
|f0| ~ 31 / 234 at M=256 / 512, N=196) and the first gradient steps are
mis-scaled by the same factor. product_init now probes max|f| on the
calibration batch and rescales the label leg when the init lands outside
[0.1, 10] — the single-scalar analogue of the reference's output
calibration (Network_class.py:165-182).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tensornetworkforml_tpu.models.mps import mps_forward, product_init
from tensornetworkforml_tpu.ops.embedding import psi_embed


def _probe(key, B, N):
    return jax.random.uniform(key, (B, N), dtype=jnp.float32)


def test_pathological_scale_is_normalized():
    # noise=0.05 at M=64,D=2 gives per-site growth ~1.15 -> ~7e3 at N=64:
    # far outside the band, so the guard must fire and pin max|f| to 1.0
    # exactly on the calibration batch.
    N, M = 64, 64
    x = _probe(jax.random.PRNGKey(42), 16, N)
    mps = product_init(
        jax.random.PRNGKey(0), N=N, M=M, L=10, noise=0.05,
        dtype=jnp.float32, calibration_x=x,
    )
    f = mps_forward(mps, psi_embed(x))
    f_max = float(jnp.max(jnp.abs(f)))
    assert np.isfinite(f_max)
    assert abs(f_max - 1.0) < 1e-4, f_max


def test_healthy_small_M_init_untouched():
    # The validated small-M recipes land well inside the band; the guard
    # must not rescale them (behavior bit-identical to pre-guard code).
    N, M = 64, 8
    x = _probe(jax.random.PRNGKey(7), 16, N)
    mps = product_init(
        jax.random.PRNGKey(0), N=N, M=M, L=10, noise=1e-2,
        dtype=jnp.float32, calibration_x=x,
    )
    f_max = float(jnp.max(jnp.abs(mps_forward(mps, psi_embed(x)))))
    assert 0.1 <= f_max <= 10.0, f_max
    # guard-fired inits pin max|f| to exactly 1.0; a healthy init should
    # retain its natural (non-unit) scale
    assert abs(f_max - 1.0) > 1e-6


def test_probe_batch_used_when_no_calibration_data():
    # Without calibration data the guard probes a uniform batch; the init
    # must still come out finite and O(1)-bounded for pathological noise.
    N, M = 64, 64
    mps = product_init(
        jax.random.PRNGKey(3), N=N, M=M, L=10, noise=0.05,
        dtype=jnp.float32,
    )
    x = _probe(jax.random.PRNGKey(11), 16, N)
    f_max = float(jnp.max(jnp.abs(mps_forward(mps, psi_embed(x)))))
    assert np.isfinite(f_max)
    assert f_max < 20.0, f_max
