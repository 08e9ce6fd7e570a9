"""10x scale probe for the durable retrieval-stats asset
(term_stats_table + against_stats=): a FIXED batch scored while the
corpus behind it grows 10x.

The claim probed: with STORED stats the per-query cost is bounded by
the batch + the vocab-row probe (corpus text never re-tokenized), so
it stays ~flat as the corpus grows — while SELF mode re-tokenizes the
whole corpus per call and grows ~linearly. Same methodology as
ingest_probe.py: all inputs persisted + counted before timing; median
of 3 after a warm pass. Usage: python scripts/retrieval_probe.py
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from littletable_spark import Table, get_spark

SF_DIR = "/root/testdata/sf0.1"
COPIES = 10
QUERY = "spark table merge"


def main() -> None:
    from littletable_spark.operators.textops import (
        bm25_topk,
        term_stats_table,
        tfidf_top_terms,
    )

    spark = get_spark(cpus=32)
    d1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    d10 = None
    for i in range(COPIES):
        rep = d1.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100_000_000))
        d10 = rep if d10 is None else d10.unionByName(rep)
    d10 = d10.persist()
    for df in (d1, d10):
        df.count()
    t1, t10 = Table.from_df(d1), Table.from_df(d10)

    # one-time stats builds, parked as parquet (the durable asset; the
    # build itself is the amortized cost, reported separately)
    root = tempfile.mkdtemp(prefix="lts_retr_idx_")
    builds = {}
    for tag, t in (("1x", t1), ("10x", t10)):
        t0 = time.perf_counter()
        term_stats_table(t, "text", "doc_id").df.write.parquet(f"{root}/{tag}")
        builds[tag] = time.perf_counter() - t0
    s1 = Table.parquet_import(spark, f"{root}/1x")
    s10 = Table.parquet_import(spark, f"{root}/10x")

    batch = Table.from_df(
        d1.where(F.pmod(F.col("doc_id"), F.lit(9)) == 0)
        .select("doc_id", "text")
        .persist()
    )
    len(batch)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    cases = {
        "bm25_self_1x": lambda: noop(bm25_topk(t1, "text", "doc_id", QUERY, k=8).df),
        "bm25_self_10x": lambda: noop(bm25_topk(t10, "text", "doc_id", QUERY, k=8).df),
        "bm25_stored_1x": lambda: noop(
            bm25_topk(batch, "text", "doc_id", QUERY, k=8, against_stats=s1).df
        ),
        "bm25_stored_10x": lambda: noop(
            bm25_topk(batch, "text", "doc_id", QUERY, k=8, against_stats=s10).df
        ),
        "tfidf_stored_1x": lambda: noop(
            tfidf_top_terms(batch, "text", "doc_id", k=3, against_stats=s1).df
        ),
        "tfidf_stored_10x": lambda: noop(
            tfidf_top_terms(batch, "text", "doc_id", k=3, against_stats=s10).df
        ),
    }
    meds: dict[str, float] = {}
    for label, fn in cases.items():
        fn()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        meds[label] = sorted(ts)[1]

    for tag in ("1x", "10x"):
        print(f"stats_build_{tag}: {builds[tag]:.2f}s (one-time)")
    for k, v in meds.items():
        print(f"{k}: {v:.2f}s")
    for op in ("bm25_self", "bm25_stored", "tfidf_stored"):
        print(f"{op} growth: {meds[op + '_10x'] / meds[op + '_1x']:.2f}x")


if __name__ == "__main__":
    main()
