"""Focused probe for ngram_jaccard_pairs: forced prefix_filter on/off
at 1x and 10x (letter-rotated replicas, same corpus construction as
scale_probe.py) to locate the adaptive-threshold crossover empirically.

Usage: python scripts/jaccard_probe.py [copies ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from littletable_spark import Table, get_spark
from littletable_spark.operators.dedup import ngram_jaccard_pairs

SF_DIR = "/root/testdata/sf0.1"
LETTERS = "aeiousnrtl"


def corpus(spark, copies: int):
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if copies == 1:
        return docs1
    out = None
    for i in range(copies):
        rot = LETTERS[i:] + LETTERS[:i]
        rep = docs1.withColumn("text", F.translate(F.col("text"), LETTERS, rot))
        rep = rep.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100_000_000))
        out = rep if out is None else out.unionByName(rep)
    return out


def run(t, pf):
    df = ngram_jaccard_pairs(t, "doc_id", "text", threshold=0.8, prefix_filter=pf).df
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(cpus=32)
    copies_list = [int(c) for c in sys.argv[1:]] or [1, 10]
    for copies in copies_list:
        src = corpus(spark, copies).persist()
        src.count()  # pin the synthetic corpus so reps time jaccard only
        for pf in (False, True):
            for mode in ("cold", "warm"):
                t = Table.from_df(src)
                run(t, pf)  # JIT/codegen warm
                times = []
                for _ in range(3):
                    if mode == "cold":
                        # full pipeline incl. shingle+distinct: new
                        # Table, all jaccard caches dropped
                        spark.catalog.clearCache()
                        src.persist(); src.count()
                        t = Table.from_df(src)
                    t0 = time.perf_counter()
                    run(t, pf)
                    times.append(time.perf_counter() - t0)
                n_pairs = ngram_jaccard_pairs(
                    t, "doc_id", "text", threshold=0.8, prefix_filter=pf
                ).df.count()
                print(
                    f"copies={copies:<3} prefix={str(pf):<5} mode={mode} "
                    f"min={min(times):.2f}s med={sorted(times)[1]:.2f}s "
                    f"pairs={n_pairs}"
                )
        src.unpersist()


if __name__ == "__main__":
    main()
