"""The shipped examples must stay runnable (they are executable docs)."""

import runpy
import sys

import pytest


@pytest.mark.parametrize("script", [
    "examples/02_fused_epoch_and_serving.py",
    "examples/03_data_parallel_mesh.py",
    "examples/05_production_recipe.py",
    "examples/06_brickwall_parallel_bonds.py",
])
def test_example_runs(script, capsys):
    runpy.run_path(script, run_name="__main__")
    out = capsys.readouterr().out
    assert "accuracy" in out
