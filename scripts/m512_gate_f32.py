#!/usr/bin/env python
"""M=512 quality-gate diagnostic: same config as m512_quality_gate but
with matmul_precision='float32' forced, to test whether the post-growth
collapse (val 1.0 -> 0.10 right after bond 128 -> 512) is bf16-MXU
noise in the split's Gram/sketch at high rank deficiency (live rank 256
of 1024 columns)."""

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
    ap.add_argument("--precision", default="float32")
    ap.add_argument("--factored", default="auto")
    ap.add_argument("--fused", type=int, default=1,
                    help="0 disables the fused whole-epoch program "
                         "(isolates train/epoch.py from the collapse)")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--out",
                    default="/root/repo/results/m512_quality_gate_f32.json")
    args = ap.parse_args()

    import tensornetworkforml_tpu.train.trainer as _tr

    _orig = _tr.train_model

    def _tm(*a, **kw):
        kw.setdefault("matmul_precision", args.precision)
        kw.setdefault("factored_update", args.factored)
        kw.setdefault("fused", bool(args.fused))
        kw["n_epochs"] = args.epochs
        return _orig(*a, **kw)

    quality_gates.train_model = _tm
    _tr.train_model = _tm

    out = run_config(
        "fashion-m512", lambda: _make_data_for("fashion"),
        N=196, M=512, pool=True, n_epochs=6, lr=0.1,
        out_path=args.out,
        bond_schedule={2: 128, 4: 512},
    )
    with open(args.out) as f:
        rec = json.load(f)
    rec["matmul_precision"] = args.precision
    rec["factored_update"] = args.factored
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print("done:", rec["val_acc"], "test", rec["test_acc"], flush=True)


if __name__ == "__main__":
    main()
