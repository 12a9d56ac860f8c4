"""d-dimensional Z-order codec — the mechanical generalization SURVEY.md
§1.4 promised (the reference hard-codes d=2, ``Utils.java:32``,
``Index.java:130-133``).

Built bit-by-bit instead of with the 2-D magic-mask rounds: for ``d``
dimensions × ``b`` bits each, bit ``j`` of dimension ``i`` lands at z-bit
``j*d + (d-1-i)`` (dimension 0 highest within each group, matching the
2-D layout where x takes the upper bit of each pair). Each input column
is referenced once per bit — a linear expression tree of ``d*b`` terms,
no duplication blowup (see zorder.py's expression-shape note), and the
whole thing stays inside whole-stage codegen.

The z-value is monotone per axis (holding others fixed), so the
d-dimensional rectangle's z-window ``[zip(mins), zip(maxs)]`` covers all
its points — the same pruning property the 2-D layout uses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["zvalue_nd", "zvalue_nd_py", "zvalue_nd_sql", "rect_predicate_nd"]


def _check(d: int, bits: int) -> None:
    if d < 1 or d * bits > 63:
        raise ValueError(
            f"d*bits must fit a non-negative signed long: got {d}*{bits}"
        )


def zvalue_nd(cols: list[Column | str], bits: int) -> Column:
    """Interleave ``len(cols)`` non-negative ints (< 2^bits) into one
    LongType Morton code."""
    d = len(cols)
    _check(d, bits)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("long")
        for j in range(bits):
            src = F.shiftright(v, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(src, j * d + (d - 1 - i)))
    return z


def zvalue_nd_py(vals: list[int], bits: int) -> int:
    d = len(vals)
    _check(d, bits)
    z = 0
    for i, v in enumerate(vals):
        if v < 0 or v >= 1 << bits:
            raise ValueError(f"value {v} outside [0, 2^{bits})")
        for j in range(bits):
            z |= ((v >> j) & 1) << (j * d + (d - 1 - i))
    return z


def zvalue_nd_sql(exprs: list[str], bits: int) -> str:
    """DuckDB/ANSI twin: same bit-by-bit construction."""
    d = len(exprs)
    _check(d, bits)
    terms = []
    for i, e in enumerate(exprs):
        v = f"CAST({e} AS BIGINT)"
        for j in range(bits):
            terms.append(f"((({v} >> {j}) & 1) << {j * d + (d - 1 - i)})")
    return "(" + " | ".join(terms) + ")"


def rect_predicate_nd(bounds: dict[str, tuple[int, int]]) -> Column:
    """Inclusive hyper-rectangle membership over named columns."""
    pred = F.lit(True)
    for col, (lo, hi) in bounds.items():
        pred = pred & F.col(col).between(lo, hi)
    return pred
