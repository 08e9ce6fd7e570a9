"""Synthesize an ~sf1 dataset from sf0.1 for the scaling spot-bench.

Unions 10 key-shifted replicas of the sf0.1 tables the six biggest
bench rows consume (documents, embeddings, lineitem) and writes them as
parquet under the output dir, so `scripts/time_query.py --sf <out>` can
time those rows at 10x volume and 8-vs-32 cores. Replica salting keeps
the workload SHAPE honest:

- documents: doc_id shifted by 10M per replica and a " rNN" sentinel
  token appended to the text — otherwise every doc would have 9 exact
  clones and the dedup/ingest rows would measure a pathological
  10x-duplicate corpus instead of 10x more data.
- embeddings: vec_id shifted; a tiny per-replica rotation of the first
  two vector components keeps vectors distinct without changing norms
  (cosine-topk/IVF workloads stay realistic — no 10-way ties).
- lineitem: orderkey shifted (stats only aggregates value columns).

Usage: python scripts/sf1_synth.py [OUT_DIR] (default /tmp/sf1synth)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from littletable_spark import get_spark

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1synth"
COPIES = 10
SHIFT = 10_000_000


def main() -> None:
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    def replicas(df, build):
        out = None
        for i in range(COPIES):
            rep = build(df, i)
            out = rep if out is None else out.unionByName(rep)
        return out

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    replicas(
        docs,
        lambda df, i: df.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * SHIFT)
        ).withColumn("text", F.concat(F.col("text"), F.lit(f" r{i:02d}"))),
    ).repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim_cols = emb.columns

    def emb_rep(df, i):
        # rotate (v0, v1) by a small per-replica angle: distinct vectors,
        # unchanged norms
        import math

        th = 0.03 * i
        c, s = math.cos(th), math.sin(th)
        v = F.col("embedding")
        rotated = F.concat(
            F.array(
                v[0] * F.lit(c) - v[1] * F.lit(s),
                v[0] * F.lit(s) + v[1] * F.lit(c),
            ),
            F.slice(v, 3, 100_000),
        )
        return df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * SHIFT)
        ).withColumn("embedding", rotated).select(*dim_cols)

    replicas(emb, emb_rep).repartition(32).write.mode("overwrite").parquet(
        f"{OUT}/embeddings.parquet"
    )

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    replicas(
        li,
        lambda df, i: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * SHIFT)
        ),
    ).repartition(32).write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")

    for t in ("documents", "embeddings", "lineitem"):
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
