"""Measured collective-communication accounting from compiled HLO.

`capacity.ici_bytes_per_step` predicts the gauss-shard exchange volume in
closed form; this module MEASURES what the compiled program actually moves
(VERDICT r4 item 6), by walking the post-SPMD-partitioning optimized HLO for
collective ops and summing their per-device operand bytes. The two must
agree — a drifted prediction means the capacity plan (and the weak-scaling
model built on it) is pricing the wrong program.

Byte conventions (per device, one direction, counting only bytes that leave
the chip — matching `capacity.ici_bytes_per_step`):

  * all-to-all, local operand B bytes: (D-1)/D * B leaves the chip
    (the diagonal block stays local).
  * collective-permute, operand B: B (every element moves to another chip).
  * all-reduce, operand B: 2 * (D-1)/D * B (ring allreduce:
    reduce-scatter + all-gather).
  * all-gather, output B: (D-1)/D * B.
  * reduce-scatter, input B: (D-1)/D * B.

These are the standard ring-schedule volumes (scaling-book accounting); the
actual runtime may choose other schedules, but volume-per-device is
schedule-invariant for a2a/permute and a lower bound for the reductions.
"""

from __future__ import annotations

import re
from typing import Dict

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1,
}

# One shaped buffer inside an HLO result type, e.g. `f32[8,1280,16]`.
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")

_COLLECTIVES = ("all-to-all", "collective-permute", "all-reduce",
                "all-gather", "reduce-scatter")

# `%name = <result type> <op>(`: result type runs from '=' to the op name.
_INSTR_RE = re.compile(
    r"=\s*(.*?)\s*(" + "|".join(_COLLECTIVES) + r")(?:-start)?\(")


def _shape_bytes(result_type: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(result_type):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str, n_devices: int) -> Dict[str, int]:
    """Per-device off-chip traffic by collective type, in bytes, from the
    optimized (post-partitioning) HLO text of ONE executable. `-done` halves
    of async collectives carry the same result type as their `-start`; only
    starts are counted (done ops don't match: HLO spells them
    `all-to-all-done(...)` with no shape-bearing operand pattern we match
    twice — verified against jax CPU lowerings in tests/test_hlo_comm.py).

    Volume factors follow the module docstring. Returns a dict with one
    entry per op type present plus "total".
    """
    frac = (n_devices - 1) / n_devices
    factors = {
        "all-to-all": frac,
        "collective-permute": 1.0,
        "all-reduce": 2.0 * frac,
        "all-gather": frac,
        "reduce-scatter": frac,
    }
    out: Dict[str, int] = {}
    total = 0.0
    for m in _INSTR_RE.finditer(hlo_text):
        result_type, op = m.group(1), m.group(2)
        b = _shape_bytes(result_type) * factors[op]
        out[op] = out.get(op, 0) + int(round(b))
        total += b
    out["total"] = int(round(total))
    return out


def compiled_collective_bytes(fn, n_devices: int, *args, **kwargs):
    """Lower + compile `fn(*args, **kwargs)` and account its collectives.
    Returns (bytes_by_type, compiled) so callers can also execute/inspect."""
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    text = compiled.as_text()
    return collective_bytes(text, n_devices), compiled
