"""Dump the FULL `.explain("formatted")` output of named registered queries
to plans/r12/<query>_<tag>.txt — the before/after plan evidence the
optimization round commits alongside each change.

Usage: python tools/capture_plans.py TAG QUERY [QUERY ...] [--sf SF_DIR]
  TAG is `before` or `after` (or any suffix).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    tag, names = args[0], args[1:]

    import __spark_entry__ as e
    from airdatapipeline_spark.session import get_spark

    spark = get_spark("capture-plans")
    qs = e.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
