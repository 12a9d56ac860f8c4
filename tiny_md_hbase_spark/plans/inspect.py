"""Extract structural facts from a DataFrame's physical plan.

All functions work on the *planned* (pre-AQE) physical plan text from
``explain``: that is the plan the optimizer committed to, so contracts
written against it are deterministic (AQE may collapse exchanges at
runtime, which only makes reality cheaper than the contract).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# a shuffle line is "Exchange hashpartitioning(...)" (possibly behind a
# tree-drawing prefix and a codegen star); "BroadcastExchange" never
# matches because "Broadcast" cannot appear in the allowed prefix
_SHUFFLE_RE = re.compile(r"^[\s+:|-]*(?:\*\(\d+\)\s*)?Exchange\b", re.M)
_BROADCAST_JOIN_RE = re.compile(r"BroadcastHashJoin|BroadcastNestedLoopJoin")
_PUSHED_RE = re.compile(r"PushedFilters:\s*\[([^\]]*)\]")
_READSCHEMA_RE = re.compile(r"ReadSchema:\s*(\S+)")
_CODEGEN_ID_RE = re.compile(r"\[codegen id :\s*(\d+)\]")


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The string ``df.explain(mode)`` would print."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def _current_plan(df: DataFrame) -> str:
    """The plan that is (or will be) executed: once AQE has run a query,
    explain shows '== Final Plan ==' followed by '== Initial Plan ==' —
    counting both would double every operator."""
    plan = explain_str(df, "simple")
    return plan.split("== Initial Plan ==", 1)[0]


def exchange_count(df: DataFrame) -> int:
    """Number of *shuffle* exchanges (hash/range/single-partition data
    movement) in the planned physical plan; broadcast exchanges are
    excluded — see :func:`broadcast_join_count` for those."""
    return len(_SHUFFLE_RE.findall(_current_plan(df)))


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins in the planned physical plan."""
    return len(_BROADCAST_JOIN_RE.findall(_current_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """Every filter pushed into a file-source scan, flattened across
    scans; empty list means nothing reached the readers."""
    out: list[str] = []
    for m in _PUSHED_RE.finditer(explain_str(df, "formatted")):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema of each file-source scan — the columns actually
    read from disk (column-pruning contract)."""
    return _READSCHEMA_RE.findall(explain_str(df, "formatted"))


def wholestage_codegen_ids(df: DataFrame) -> set[int]:
    """Distinct whole-stage-codegen span ids; non-empty means the hot
    path compiles to fused JVM kernels."""
    return {int(x) for x in _CODEGEN_ID_RE.findall(explain_str(df, "formatted"))}
