"""HLO introspection: collective-traffic accounting for compiled steps.

The reference has no distributed layer to account for (SURVEY.md section 2c);
here the mesh-sharded train step's ICI traffic is a first-class observable.
``collective_bytes_summary`` parses a compiled HLO dump and totals the bytes
moved by each collective kind, so tests (``tests/test_parallel.py``) and the
driver dry run (``__graft_entry__.dryrun_multichip``) can assert the step's
communication stays bounded by one gradient psum instead of trusting a
silent "OK".
"""

from __future__ import annotations

import re

COLLECTIVE_KINDS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "reduce-scatter",
)

_DTYPE_BYTES = {
    "f64": 8, "u64": 8, "s64": 8, "c64": 8,
    "f32": 4, "u32": 4, "s32": 4,
    "bf16": 2, "f16": 2, "u16": 2, "s16": 2,
    "u8": 1, "s8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"=\s*(\w+)\[([\d,]*)\]")


def _op_bytes(line: str) -> int:
    """Bytes of the result shape on an HLO instruction line (0 if shapeless)."""
    m = _SHAPE_RE.search(line)
    if not m:
        return 0
    dtype, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return _DTYPE_BYTES.get(dtype, 4) * n


def collective_bytes_summary(hlo_text: str) -> dict:
    """Total the bytes moved by each collective in a compiled-HLO dump.

    ``hlo_text`` is ``jit(f).lower(...).compile().as_text()``. Returns::

        {"collective_bytes": {kind: bytes, ...},
         "total_collective_bytes": int,
         "n_allreduce": int,
         "biggest_allgather_bytes": int}

    Bytes are counted from each collective's RESULT shape — for an
    all-reduce that equals the payload; for gather/scatter variants it is
    the post-op shape, which upper-bounds (gather) or lower-bounds
    (scatter) the per-link traffic. Good enough for the regression this
    guards: an involuntary GSPMD re-layout moves full activation tensors
    and shows up at any of these counts.
    """
    coll = {k: 0 for k in COLLECTIVE_KINDS}
    n_allreduce = 0
    biggest_allgather = 0
    for ln in hlo_text.splitlines():
        for k in COLLECTIVE_KINDS:
            if " " + k in ln or ln.lstrip().startswith(k):
                b = _op_bytes(ln)
                coll[k] += b
                if k == "all-reduce":
                    n_allreduce += 1
                if k == "all-gather":
                    biggest_allgather = max(biggest_allgather, b)
                break
    return {
        "collective_bytes": coll,
        "total_collective_bytes": sum(coll.values()),
        "n_allreduce": n_allreduce,
        "biggest_allgather_bytes": biggest_allgather,
    }
