"""Gates for the driver entry points (__graft_entry__.py).

Round-3 postmortem: MULTICHIP_r03 timed out (rc=124) because the bootstrap
probe called ``jax.default_backend()`` which *initializes* the axon TPU
backend — and that init blocks indefinitely when the tunnel is down. These
tests pin the two properties that keep the gate green independently of TPU
reachability: (1) the probe never initializes a backend it didn't find
already configured for cpu, and (2) the full dryrun stays inside the
driver's wall-clock budget.
"""

import sys
import time
import types

import tests.conftest  # noqa: F401  (forces cpu backend, 8 virtual devices)


def _load_entry():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(repo, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_never_inits_backend_when_platform_not_cpu(monkeypatch):
    """Fake the axon situation: jax pre-imported, platform config NOT 'cpu'.

    The probe must return False WITHOUT calling device_count/default_backend
    (either would initialize the TPU backend and hang mid-outage)."""
    entry = _load_entry()

    calls = []

    def boom(*a, **k):
        calls.append("backend-init")
        raise AssertionError("probe initialized a backend")

    fake = types.ModuleType("jax")
    fake.config = types.SimpleNamespace(jax_platforms=None)  # axon default
    fake.device_count = boom
    fake.default_backend = boom
    fake.devices = boom
    monkeypatch.setitem(sys.modules, "jax", fake)

    assert entry._have_virtual_devices(8) is False
    assert calls == []

    fake.config = types.SimpleNamespace(jax_platforms="tpu")
    assert entry._have_virtual_devices(8) is False
    assert calls == []


def test_probe_true_on_configured_cpu_mesh():
    """Under the test config (jax_platforms=cpu, 8 virtual devices) the
    probe says yes, so pytest-side dryruns run in-process."""
    entry = _load_entry()
    assert entry._have_virtual_devices(8) is True


def test_dryrun_within_driver_budget():
    """The in-process dryrun body must stay far inside the driver timeout.

    33 s on this host at round 3/4; budget 240 s so additions that push the
    gate toward rc=124 territory fail HERE first."""
    entry = _load_entry()
    t0 = time.perf_counter()
    entry.dryrun_multichip(8)
    elapsed = time.perf_counter() - t0
    assert elapsed < 240.0, f"dryrun took {elapsed:.0f}s — driver gate at risk"


def test_entry_compiles_single_chip():
    import jax

    entry = _load_entry()
    fn, args = entry.entry()
    out = jax.jit(fn)(*args)
    import numpy as np

    assert np.isfinite(np.asarray(out)).all()
