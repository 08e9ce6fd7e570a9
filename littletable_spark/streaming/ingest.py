"""Streaming curated ingestion: the foreachBatch sink that turns the
durable dedup index into a running pipeline.

Micro-batches of new documents are deduped INSIDE ``foreachBatch`` —
first within the batch, then against the stored corpus band index
(``minhash_band_table`` parquet) — and survivors append to the corpus
AND extend the index. The settled corpus is never re-shingled or even
re-scanned: each batch costs its own banding plus one join against the
stored index, which is the only cost profile that survives a 100 TB
corpus ingesting a few GB a night.

Exactly-once: Structured Streaming re-delivers a micro-batch after a
failure, so the sink writes each batch to its own
``<path>/batch_id=<id>`` partition directory with ``overwrite`` — a
re-delivered batch overwrites its own output instead of double-
appending (the standard idempotent-foreachBatch discipline). Reading
``corpus_path`` with plain ``spark.read.parquet`` recovers ``batch_id``
as a partition column for free lineage.

No reference analog (the reference has no streaming at all — SURVEY.md
§2.9); this composes the round-6 durable-index assets (operators/
dedup.py:minhash_band_table / against_bands=) with a Spark-native
sink.
"""
from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F
from pyspark.errors import AnalysisException

from ..table import Table


def _as_df(obj: Any) -> DataFrame:
    return obj.df if isinstance(obj, Table) else obj


def ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_path: str,
    bands_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    collect_stats: bool = True,
) -> dict[str, int]:
    """Process ONE micro-batch (plain batch DataFrame — callable
    directly in tests or backfills, no stream required):

    1. within-batch near-dup drop: MinHash+LSH self-pairs, greedy
       keep-the-smaller-id policy (every ``id2`` of a candidate pair
       drops — the per-batch convention; use ``dup_clusters`` +
       ``keep_canonical`` in a batch backfill when cluster-exact
       canonicalization matters),
    2. corpus dedup: survivors probe the stored band index via
       ``against_bands=`` (no corpus scan; first batch skips this —
       the index doesn't exist yet),
    3. idempotent append: survivors land in
       ``corpus_path/batch_id=<id>``, their band rows in
       ``bands_path/batch_id=<id>``, both mode=overwrite so a
       re-delivered batch replaces its own output.

    Returns counts for observability. ``collect_stats=False`` skips
    the extra count jobs (two per batch) when the sink runs hot.
    """
    from ..operators.dedup import minhash_band_table, minhash_lsh_pairs

    spark = batch_df.sparkSession
    batch = batch_df.persist()
    try:
        n_in = batch.count() if collect_stats else -1

        t = Table.from_df(batch, name=f"ingest_batch_{batch_id}")
        self_pairs = minhash_lsh_pairs(
            t, id_col, text_col, n=n, num_hashes=num_hashes, band_size=band_size
        ).df
        drop_self = self_pairs.select(F.col("id2").alias(id_col)).distinct()
        kept = batch.join(drop_self, on=id_col, how="left_anti")

        try:
            stored = spark.read.parquet(bands_path)
        except AnalysisException:
            stored = None  # first batch: no index yet
        if stored is not None:
            # a RE-DELIVERED batch already has its own band rows in the
            # index — probing them would match every doc against itself
            # and overwrite the partition with nothing. Excluding the
            # batch's own partition (pruned at scan, it's the partition
            # column) keeps redelivery idempotent instead of lossy.
            stored = stored.where(F.col("batch_id") != F.lit(int(batch_id)))
            cross = minhash_lsh_pairs(
                Table.from_df(kept),
                id_col,
                text_col,
                n=n,
                num_hashes=num_hashes,
                band_size=band_size,
                against_bands=Table.from_df(
                    stored.select(id_col, "band", "band_key")
                ),
            ).df
            drop_cross = cross.select(F.col("id1").alias(id_col)).distinct()
            kept = kept.join(drop_cross, on=id_col, how="left_anti")

        kept = kept.persist()
        try:
            n_kept = kept.count() if collect_stats else -1
            kept.write.mode("overwrite").parquet(
                f"{corpus_path}/batch_id={batch_id}"
            )
            bands_new = minhash_band_table(
                Table.from_df(kept),
                id_col,
                text_col,
                n=n,
                num_hashes=num_hashes,
                band_size=band_size,
            ).df
            bands_new.write.mode("overwrite").parquet(
                f"{bands_path}/batch_id={batch_id}"
            )
        finally:
            kept.unpersist()
    finally:
        batch.unpersist()
    return {
        "batch_id": int(batch_id),
        "received": n_in,
        "appended": n_kept,
        "dropped": (n_in - n_kept) if collect_stats else -1,
    }


def start_curated_ingest(
    stream: Any,
    corpus_path: str,
    bands_path: str,
    checkpoint: str,
    available_now: bool = True,
    **params: Any,
):
    """Wire ``ingest_batch`` into a Structured Streaming sink.

    ``stream`` is a streaming Table or DataFrame of documents;
    ``checkpoint`` is the required checkpointLocation (offsets +
    batch ids — together with the per-batch overwrite this is what
    makes restarts exactly-once). ``available_now=True`` drains the
    currently-available input and stops (the scheduled nightly-ingest
    shape); pass ``False`` for a continuously-running micro-batch
    query. Extra kwargs flow to ``ingest_batch``."""
    df = _as_df(stream)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df, batch_id, corpus_path, bands_path, **params)

    writer = (
        df.writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
