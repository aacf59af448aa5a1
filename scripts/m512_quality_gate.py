#!/usr/bin/env python
"""Training-quality gate for the round-5 factored M=512 path.

The M=512 speed work (train/factored_step.py: HIGH-precision iterate +
shortened q>=512 Polar-Express schedules, results/factored_m512_tpu.json)
changes the split's numerics inside its measured iso/capture envelope
(results/iterate_variants.json). This gate proves END-TO-END training
quality through the new path: the fashion-shaped 10-class task of
results/fashion_gate.json, grown 32 -> 128 -> 512 so the last two epochs
run every two-site update through the factored engine (auto-dispatch at
M*D > 512). Pass = test accuracy >= the fashion gate's 1.0 within noise.

Results -> results/m512_quality_gate.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quality_gates import _make_data_for, run_config  # noqa: E402


def main():
    out = run_config(
        "fashion-m512", lambda: _make_data_for("fashion"),
        N=196, M=512, pool=True, n_epochs=6, lr=0.1,
        out_path="/root/repo/results/m512_quality_gate.json",
        bond_schedule={2: 128, 4: 512},
    )
    assert out["test_acc"] >= 0.97, out
    print("M=512 quality gate PASSED", flush=True)


if __name__ == "__main__":
    main()
