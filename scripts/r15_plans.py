"""Dump `.explain("formatted")` for a list of registry keys into
plans/r15/<key>_<tag>.txt — the before/after plan evidence for the
optimization round.

Usage: PYTHONPATH=/root/repo python scripts/r15_plans.py <tag> <key> [key ...]
       (tag is "before" or "after"; sf dir via SPARK_GRAFT_SF_DIR,
        default sf0.01 — plans are scale-independent)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tiny_md_hbase_spark import plans as P
from tiny_md_hbase_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r15-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs = entrymod.queries()
    for key in keys:
        df = qs[key](spark, sf_dir)
        plan = P.explain_str(df, "formatted")
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan.strip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
