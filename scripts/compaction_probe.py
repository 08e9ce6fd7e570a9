"""Small-files probe for durable-asset compaction (round 7).

Builds the band index the way a long-running ingest does — many tiny
``batch_id=`` partitions — then times the SAME fixed-batch dedup probe
against (a) the fragmented asset and (b) the compacted asset, plus the
asset's listing/read overhead directly. The data is identical in both
layouts; any delta is pure file-count overhead, which is the cost that
compounds at nightly-crawl scale (hundreds of micro-batches a day).

Usage: python scripts/compaction_probe.py [n_batches]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from littletable_spark import Table, get_spark
from littletable_spark.operators.dedup import minhash_lsh_pairs
from littletable_spark.streaming.ingest import ingest_batch
from littletable_spark.streaming.maintenance import asset_info, compact_asset

SF_DIR = "/root/testdata/sf0.1"
N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 60


def probe(spark, bands_path, batch_df, label):
    """The steady-state ingest cost: band the fixed batch, join it
    against the stored index. Timed warm (median of 3)."""
    times = []
    stored = Table.parquet_import(spark, bands_path)
    for _ in range(3):
        t0 = time.time()
        new = Table.from_df(batch_df)
        pairs = minhash_lsh_pairs(new, "doc_id", "text", against_bands=stored)
        n = pairs.df.count()
        times.append(time.time() - t0)
    times.sort()
    print(f"{label}: probe {times[1]:.3f}s (pairs={n})")
    return times[1]


def main():
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="lts_compact_probe_")
    corpus, bands = f"{root}/corpus", f"{root}/bands"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    per = max(1, n_docs // N_BATCHES)

    t0 = time.time()
    for b in range(N_BATCHES):
        chunk = docs.where(
            (F.col("doc_id") % N_BATCHES) == b
        ).select("doc_id", "text")
        ingest_batch(chunk, b, corpus, bands, collect_stats=False)
    print(
        f"built {N_BATCHES} batches (~{per} docs each) "
        f"in {time.time() - t0:.1f}s"
    )

    batch_df = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    batch_df = batch_df.persist()
    batch_df.count()

    info_frag = asset_info(spark, bands)
    print(f"fragmented: {info_frag}")
    t_frag = probe(spark, bands, batch_df, "fragmented")

    t0 = time.time()
    res = compact_asset(spark, bands)
    print(f"compacted in {time.time() - t0:.1f}s: {res}")
    info_comp = asset_info(spark, bands)
    print(f"compacted layout: {info_comp}")
    t_comp = probe(spark, bands, batch_df, "compacted")

    print(
        f"RESULT files {info_frag['files']} -> {info_comp['files']}, "
        f"probe {t_frag:.3f}s -> {t_comp:.3f}s "
        f"({t_frag / t_comp:.2f}x)"
    )


if __name__ == "__main__":
    main()
