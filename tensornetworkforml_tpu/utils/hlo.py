"""Compiled-HLO introspection: collective ops, shapes, bytes.

Used by ``scripts/scaling_evidence.py`` and the scaling tests to turn the
communication-structure claims of ``docs/SCALING.md`` into checked
properties of the compiled programs (the reference has no distributed
machinery to compare against, SURVEY.md section 2.1 -- the evidence here
is against the design's own claims).
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "pred": 1, "s8": 1, "u8": 1}

COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute", "all-to-all")

_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")


def parse_collectives(hlo_text: str):
    """Extract every collective op from optimized HLO text.

    Returns a list of ``{"computation", "op", "shapes", "bytes"}``.
    ``-start`` ops are counted; their matching ``-done`` ops are not (one
    transfer each). Shapes are read off the op's result type(s), tuple
    results (variadic all-reduce) included.
    """
    comp = "?"
    found = []
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if line and not line[0].isspace():
            m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)", line)
            if m and "{" in line:
                comp = m.group(1)
            continue
        m = re.match(r"%?[\w.\-]+\s*=\s*(.*)", stripped)
        if not m:
            continue
        rhs = m.group(1)
        opm = re.search(r"\b(" + "|".join(COLLECTIVE_OPS) + r")(-start)?\(",
                        rhs)
        if not opm or re.search(r"\b\w+-done\(", rhs):
            continue
        nbytes = 0
        shapes = []
        for dt, dims in _SHAPE_RE.findall(rhs[: opm.start()]):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
            shapes.append(f"{dt}[{dims}]")
        found.append({"computation": comp, "op": opm.group(1),
                      "shapes": shapes, "bytes": nbytes})
    return found


def while_body_names(hlo_text: str):
    """Names of computations used as while-loop bodies (``lax.scan``
    lowers to ``while``; XLA names the regions e.g. ``region_0.123``)."""
    return set(re.findall(r"body=%?([\w.\-]+)", hlo_text))


def scan_body_collectives(hlo_text: str):
    """Collectives that execute once per scan iteration."""
    bodies = while_body_names(hlo_text)
    return [c for c in parse_collectives(hlo_text)
            if c["computation"] in bodies]
