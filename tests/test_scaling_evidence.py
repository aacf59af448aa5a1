"""Communication-structure properties of the compiled sharded programs
(docs/SCALING.md "Measured evidence"; VERDICT r4 item 6).

These pin the load-bearing scaling claims as properties of the OPTIMIZED
HLO on the virtual 8-device CPU mesh -- not prose: the DP sweep's entire
per-step communication is ONE (variadic) all-reduce carrying the 5-D
two-site gradient plus fused scalar metrics.
"""

import numpy as np

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

from tensornetworkforml_tpu.models.mps import mps_init
from tensornetworkforml_tpu.parallel.dp import make_sharded_train_step
from tensornetworkforml_tpu.parallel.mesh import make_mesh
from tensornetworkforml_tpu.train.sweep import SweepConfig
from tensornetworkforml_tpu.utils.hlo import (
    parse_collectives,
    scan_body_collectives,
)


def _compiled_dp_step(n_dev=4, N=12, M=8, L=10, B=64, L2_flag=False):
    mesh = make_mesh(shape=(n_dev, 1), devices=jax.devices()[:n_dev])
    cfg = SweepConfig(act_fn="linear", loss_fn="MSE", L2_flag=L2_flag,
                      split_mode="canonical", svd_method="svd")
    mps = mps_init(jax.random.PRNGKey(0), N=N, M=M, L=L,
                   act_fn="linear", loss_fn="MSE", dtype=jnp.float32)
    step = make_sharded_train_step(mesh, cfg, mps.T, L, False)
    rng = np.random.default_rng(0)
    args = (mps.sites, mps.label_site,
            jnp.asarray(rng.random((B, N)), jnp.float32),
            jnp.asarray(rng.integers(0, L, B), jnp.int32),
            jnp.float32(0.05), jnp.float32(0.0),
            jnp.full((N - 1,), M, dtype=jnp.int32))
    return step.lower(*args).compile().as_text(), (M, L)


def test_dp_sweep_one_psum_per_step():
    txt, (M, L) = _compiled_dp_step()
    body = scan_body_collectives(txt)
    # exactly ONE collective executes per sweep step
    assert len(body) == 1, body
    assert body[0]["op"] == "all-reduce"
    # ... and it carries the 5-D two-site gradient (M, D, L, D, M)
    grad_shape = f"f32[{M},2,{L},2,{M}]"
    assert grad_shape in body[0]["shapes"], body[0]
    # everything else in the whole program is O(1) scalar reductions
    others = [c for c in parse_collectives(txt) if c not in body]
    assert all(c["bytes"] <= 64 for c in others), others


def test_dp_sweep_l2_adds_no_communication():
    """Exact transfer-matrix L2 is parameter-side (replicated): turning it
    on must not add any collective."""
    txt0, _ = _compiled_dp_step(L2_flag=False)
    txt1, _ = _compiled_dp_step(L2_flag=True)
    c0 = [(c["op"], tuple(c["shapes"])) for c in parse_collectives(txt0)]
    c1 = [(c["op"], tuple(c["shapes"])) for c in parse_collectives(txt1)]
    assert c0 == c1
