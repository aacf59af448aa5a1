"""bench.py outage discipline: probe-first, one JSON error line, fast exit.

Round-3 postmortem: BENCH_r03 was rc=1 with a 30-line backend-init
backtrace and NO JSON on stdout. The driver must always get one parseable
line, with an ``error`` field when the accelerator is unreachable.
"""

import json
import sys

import tests.conftest  # noqa: F401


def _load_bench():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(repo, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_failure_emits_error_json(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(
        bench, "probe_backend", lambda *a, **k: (False, "tunnel down")
    )
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    rc = bench.main()
    assert rc == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    payload = json.loads(out[0])
    assert "error" in payload and "tunnel down" in payload["error"]
    assert payload["value"] is None and payload["vs_baseline"] is None


def test_run_crash_emits_error_json(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(bench, "probe_backend", lambda *a, **k: (True, "cpu"))

    def boom(args):
        raise RuntimeError("mid-benchmark failure")

    monkeypatch.setattr(bench, "_run", boom)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    rc = bench.main()
    assert rc == 1
    payload = json.loads(capsys.readouterr().out.strip())
    assert "mid-benchmark failure" in payload["error"]


def test_probe_subprocess_ok_on_cpu():
    """The real probe succeeds against the cpu backend (subprocess path).

    The platform override keeps the probe child off the axon backend —
    without it, this test would hang out its timeout whenever the TPU
    tunnel is down (the exact situation the probe exists to detect)."""
    bench = _load_bench()
    ok, info = bench.probe_backend(timeout_s=120.0, platform="cpu")
    assert ok, info
    assert info == "cpu"
