"""The shipped examples must stay runnable (they are executable docs).

All six examples run in CI; 01 and 04 honor TNML_SMOKE=1 which shrinks
data/epochs but keeps the code path (same chain length, same trainer)."""

import runpy
import sys

import pytest


@pytest.mark.parametrize("script", [
    "examples/01_train_diagonals_functional.py",
    "examples/02_fused_epoch_and_serving.py",
    "examples/03_data_parallel_mesh.py",
    "examples/04_onesite_full_resolution.py",
    "examples/05_production_recipe.py",
    "examples/06_brickwall_parallel_bonds.py",
])
def test_example_runs(script, capsys, monkeypatch):
    monkeypatch.setenv("TNML_SMOKE", "1")
    runpy.run_path(script, run_name="__main__")
    out = capsys.readouterr().out
    assert "accuracy" in out
