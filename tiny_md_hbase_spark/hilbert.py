"""Hilbert-curve codec — the locality-preserving alternative to the
Z-order codec in ``zorder.py``.

The reference engine keys its buckets on Morton/Z-values
(``Utils.bitwiseZip``, ``Utils.java:32-47``); the Hilbert curve is the
classic beyond-parity upgrade: consecutive curve positions are ALWAYS
unit grid steps (no Z-shape jumps), so range scans over a
Hilbert-clustered layout touch strictly fewer partition boundaries for
the same rectangle (Moon et al., "Analysis of the Clustering Properties
of the Hilbert Space-Filling Curve", TKDE 2001). Algorithms are the
public-domain iterative xy2d / d2xy bit transforms (rotate-and-reflect
per bit plane, as given on the Wikipedia "Hilbert curve" page).

Engine mapping — the iterative transform carries (x, y, d) state across
``bits`` rounds, which rules out a closed-form column expression (the
rotation makes each round's x/y reference BOTH previous x and y — a
naive expression tree doubles per round). Instead:

- Spark: ONE ``F.aggregate`` fold over the bit-plane array with a
  ``struct<x, y, acc>`` accumulator — a single JVM higher-order
  expression, constant plan size in ``bits``, no UDF, no Python.
- DuckDB twin: ``bits`` chained CTE rounds with EXPLICITLY renamed
  state columns per round (x0/y0/d0 → x1/y1/d1 → …). DuckDB permits
  lateral column-alias references within one SELECT, so reusing one
  name would silently feed a half-updated x into y's formula — the
  per-round renaming makes the twin immune to that hazard.

Scale: both directions are pure per-row scalar folds — no shuffle, no
state, embarrassingly parallel, and they compile into the scan's
projection exactly like ``zorder.zvalue``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "hilbert_encode",
    "hilbert_decode",
    "hilbert_encode_py",
    "hilbert_decode_py",
    "hilbert_encode_chain_sql",
    "hilbert_decode_chain_sql",
]

BITS = 12  # order-12 curve: the 0..4095 point domain (tables.points)


def hilbert_encode(x: Column | str, y: Column | str, bits: int = BITS) -> Column:
    """(x, y) → Hilbert distance d in [0, 4**bits), as one aggregate
    fold over the bit planes (highest first)."""
    x, y = F.col(x) if isinstance(x, str) else x, F.col(y) if isinstance(y, str) else y
    planes = F.array(
        *[F.lit(1 << i).cast("long") for i in range(bits - 1, -1, -1)]
    )
    init = F.struct(
        x.cast("long").alias("hx"),
        y.cast("long").alias("hy"),
        F.lit(0).cast("long").alias("hd"),
    )

    def step(acc: Column, s: Column) -> Column:
        rx = F.when(acc["hx"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(acc["hy"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        d2 = acc["hd"] + s * s * (rx * 3).bitwiseXOR(ry).cast("long")
        # ry=1: no rotation; ry=0, rx=1: reflect then swap; ry=0, rx=0: swap
        x2 = F.when(ry == 1, acc["hx"]).otherwise(
            F.when(rx == 1, s - 1 - acc["hy"]).otherwise(acc["hy"])
        )
        y2 = F.when(ry == 1, acc["hy"]).otherwise(
            F.when(rx == 1, s - 1 - acc["hx"]).otherwise(acc["hx"])
        )
        return F.struct(x2.alias("hx"), y2.alias("hy"), d2.alias("hd"))

    return F.aggregate(planes, init, step)["hd"]


def hilbert_decode(d: Column | str, bits: int = BITS) -> Column:
    """Hilbert distance → struct(x, y) — the exact inverse of
    :func:`hilbert_encode`, folding the bit planes lowest-first."""
    d = F.col(d) if isinstance(d, str) else d
    planes = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    init = F.struct(
        F.lit(0).cast("long").alias("hx"),
        F.lit(0).cast("long").alias("hy"),
        d.cast("long").alias("ht"),
    )

    def step(acc: Column, s: Column) -> Column:
        rx = (acc["ht"] / F.lit(2)).cast("long").bitwiseAND(F.lit(1).cast("long"))
        ry = acc["ht"].bitwiseXOR(rx).bitwiseAND(F.lit(1).cast("long"))
        x1 = F.when(ry == 1, acc["hx"]).otherwise(
            F.when(rx == 1, s - 1 - acc["hy"]).otherwise(acc["hy"])
        )
        y1 = F.when(ry == 1, acc["hy"]).otherwise(
            F.when(rx == 1, s - 1 - acc["hx"]).otherwise(acc["hx"])
        )
        return F.struct(
            (x1 + s * rx).alias("hx"),
            (y1 + s * ry).alias("hy"),
            (acc["ht"] / F.lit(4)).cast("long").alias("ht"),
        )

    out = F.aggregate(planes, init, step)
    return F.struct(out["hx"].alias("x"), out["hy"].alias("y"))


def hilbert_encode_py(x: int, y: int, bits: int = BITS) -> int:
    """Driver-side reference (tests cross-check the column forms)."""
    d, s = 0, 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_decode_py(d: int, bits: int = BITS) -> tuple[int, int]:
    t, x, y, s = d, 0, 0, 1
    while s < (1 << bits):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x, y = x + s * rx, y + s * ry
        t //= 4
        s *= 2
    return x, y


def hilbert_encode_chain_sql(
    src: str = "points", x_expr: str = "x", y_expr: str = "y", bits: int = BITS
) -> str:
    """CTE-chain fragment computing ``he{bits}(id, x{bits}, y{bits},
    d{bits})`` from ``src(id, x, y)`` — append after an existing WITH
    clause; ``d{bits}`` is the Hilbert distance."""
    ctes = [
        f"he0 AS (SELECT id, CAST({x_expr} AS BIGINT) AS x0, "
        f"CAST({y_expr} AS BIGINT) AS y0, CAST(0 AS BIGINT) AS d0 FROM {src})"
    ]
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        j, k = i, i + 1
        rx = f"((x{j} >> {bits - 1 - i}) & 1)"
        ry = f"((y{j} >> {bits - 1 - i}) & 1)"
        ctes.append(
            f"he{k} AS (SELECT id, "
            f"CASE WHEN {ry} = 1 THEN x{j} "
            f"WHEN {rx} = 1 THEN {s - 1} - y{j} ELSE y{j} END AS x{k}, "
            f"CASE WHEN {ry} = 1 THEN y{j} "
            f"WHEN {rx} = 1 THEN {s - 1} - x{j} ELSE x{j} END AS y{k}, "
            f"d{j} + {s * s} * xor(3 * {rx}, {ry}) AS d{k} FROM he{j})"
        )
    return ", ".join(ctes)


def hilbert_decode_chain_sql(
    src: str, d_expr: str = "d", bits: int = BITS
) -> str:
    """CTE-chain fragment computing ``hd{bits}(id, x{bits}, y{bits})``
    from ``src(id, d)`` — the inverse chain, bit planes lowest-first."""
    ctes = [
        f"hd0 AS (SELECT id, CAST(0 AS BIGINT) AS x0, CAST(0 AS BIGINT) "
        f"AS y0, CAST({d_expr} AS BIGINT) AS t0 FROM {src})"
    ]
    for i in range(bits):
        s = 1 << i
        j, k = i, i + 1
        rx = f"((t{j} // 2) & 1)"
        ry = f"(xor(t{j}, (t{j} // 2) & 1) & 1)"
        ctes.append(
            f"hd{k} AS (SELECT id, "
            f"(CASE WHEN {ry} = 1 THEN x{j} "
            f"WHEN {rx} = 1 THEN {s - 1} - y{j} ELSE y{j} END) + {s} * {rx} AS x{k}, "
            f"(CASE WHEN {ry} = 1 THEN y{j} "
            f"WHEN {rx} = 1 THEN {s - 1} - x{j} ELSE x{j} END) + {s} * {ry} AS y{k}, "
            f"t{j} // 4 AS t{k} FROM hd{j})"
        )
    return ", ".join(ctes)
