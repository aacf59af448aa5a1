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

import quality_gates  # noqa: E402
from quality_gates import _make_data_for, run_config  # noqa: E402


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--factored", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--out", default=
                    "/root/repo/results/m512_quality_gate.json")
    args = ap.parse_args()

    # thread the engine switch through run_config's train_model call
    import tensornetworkforml_tpu.train.trainer as _tr

    _orig = _tr.train_model

    def _tm(*a, **kw):
        kw.setdefault("factored_update", args.factored)
        return _orig(*a, **kw)

    quality_gates.train_model = _tm
    _tr.train_model = _tm

    # Round-5 root cause of the epoch-4 collapse (val 1.0 -> 0.10 at the
    # first M=512 epoch, identical across engines, precisions, and a
    # 100x lr range -- results/m512_stepdiag.json, m512_bisect.json,
    # m512_twosweep_tpu.json): canonical-gauge junk-norm accumulation in
    # the label core underflowed the next sweep's env cascades on TPU.
    # Fixed structurally by the end-of-sweep gauge rebalance
    # (SweepConfig.norm_spread, auto-on in train_model), so this gate
    # runs the ORIGINAL config unchanged.
    out = run_config(
        "fashion-m512", lambda: _make_data_for("fashion"),
        N=196, M=512, pool=True, n_epochs=6, lr=0.1,
        out_path=args.out,
        bond_schedule={2: 128, 4: 512},
    )
    out["factored_update"] = args.factored
    with open(args.out) as f:
        rec = __import__("json").load(f)
    rec["factored_update"] = args.factored
    with open(args.out, "w") as f:
        __import__("json").dump(rec, f, indent=1)
    assert out["test_acc"] >= 0.97, out
    print("M=512 quality gate PASSED", flush=True)


if __name__ == "__main__":
    main()
