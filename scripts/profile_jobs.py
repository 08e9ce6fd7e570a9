"""Count Spark jobs (and stages) per registry query — load-independent
plan-shape profiling.

Usage: python scripts/profile_jobs.py [NAME...] [--sf DIR]

For each query: one untimed warmup pass (fills caches, pins codegen),
then one profiled pass against the noop sink, reporting how many Spark
jobs and stages the pass submitted (REST status API before/after).
Job counts do not depend on box load, so this sweep is valid even on a
busy machine — it finds queries that run redundant jobs (guide §1.2),
the same probe the round-14 session used ad hoc for pagerank/ingest.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = SF_DIR
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as entrymod
    from littletable_spark import get_spark

    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "1"
    spark = get_spark(cpus=CPUS)
    queries = entrymod.queries()
    if not names:
        names = list(queries)
    for n in names:
        if n not in queries:
            raise SystemExit(f"unknown query: {n}")

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warmup: parquet footer caches + table cache fill
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    out = {}
    for n in names:
        sc.setJobDescription(f"warmup {n}")
        queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        before = tracker.getJobIdsForGroup(None) or []
        hi = max(before) if before else -1
        sc.setJobDescription(f"profiled {n}")
        queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        after = tracker.getJobIdsForGroup(None) or []
        new_jobs = [j for j in after if j > hi]
        n_stages = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        out[n] = {"jobs": len(new_jobs), "stages": n_stages}
        print(json.dumps({"query": n, **out[n]}), flush=True)
    ranked = sorted(out.items(), key=lambda kv: -kv[1]["jobs"])
    print(json.dumps({"ranked_by_jobs": [[k, v["jobs"], v["stages"]] for k, v in ranked]}))


if __name__ == "__main__":
    main()
