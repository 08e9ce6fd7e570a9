"""Capture .explain("formatted") for registry queries into plans/<round>/.

Usage: python scripts/capture_plans.py TAG [NAME...]

TAG is the filename suffix (e.g. "before" -> plans/r14/<name>_before.txt).
With no NAMEs, captures every registry query. Side-effecting lifecycle
queries (stream_ingest_*) run their ingest during construction; their
captured plan is the final read-back, which is what the judge checks.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
OUT_DIR = os.environ.get("SPARK_GRAFT_PLANS_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as entrymod
    from littletable_spark import get_spark

    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "1"
    spark = get_spark(cpus=CPUS)
    queries = entrymod.queries()
    targets = names or list(queries)
    os.makedirs(OUT_DIR, exist_ok=True)
    for n in targets:
        if n not in queries:
            raise SystemExit(f"unknown query: {n}")
        try:
            df = queries[n](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(OUT_DIR, f"{n}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
