"""Focused 10x scale probe for the late-round-6 ops: weighted group
budgets (cap_per_group weight_col=), skew_report, and the streaming
ingest sink's fixed-batch probe against a 1x vs 10x STORED band index —
plus (round 7) the FULL multi-stage curation stack (line strip + span
cut + minhash + embedding, all four durable indexes probed per batch).

Methodology matches scale_probe.py's pinned-input rule: every synthetic
input is persisted and counted before timing, so rows measure operator
growth, not corpus synthesis. Usage: python scripts/ingest_probe.py
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


def blow_up_docs(df, copies):
    out = None
    for i in range(copies):
        rep = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100_000_000))
        out = rep if out is None else out.unionByName(rep)
    return out


def timed(label, fn, res):
    t0 = time.perf_counter()
    fn()
    res[label] = time.perf_counter() - t0


def main() -> None:
    from littletable_spark.operators.sampling import cap_per_group
    from littletable_spark.operators.dedup import minhash_band_table
    from littletable_spark.streaming.ingest import ingest_batch

    spark = get_spark(cpus=32)
    d1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    d10 = blow_up_docs(d1, COPIES).persist()
    o1 = spark.read.parquet(f"{SF_DIR}/orders.parquet").persist()
    o10 = None
    for i in range(COPIES):
        rep = o1.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000))
        o10 = rep if o10 is None else o10.unionByName(rep)
    o10 = o10.persist()
    for df in (d1, d10, o1, o10):
        df.count()

    res: dict[str, float] = {}

    def cap_tokens(df):
        t = Table.from_df(df)
        # budget FIXED while the corpus grows 10x — the production shape
        # (quotas don't scale with crawl volume); survivors stay ~flat,
        # so growth here is the scan + the map-side rank prefilter
        cap_per_group(
            t, "source", 4000, key_col="doc_id", salt="tok",
            weight_col="n_chars", min_weight=40,
        ).df.write.format("noop").mode("overwrite").save()

    def skew(df):
        Table.from_df(df).skew_report(
            "o_orderstatus o_orderpriority o_custkey", top_k=5
        ).df.write.format("noop").mode("overwrite").save()

    # stored-index build (one-time cost, not the probe row): every
    # durable curation index for the 1x and 10x corpora, parked as
    # parquet — bands (minhash), boilerplate lines, span grams, and
    # embedding signatures (a deterministic 8-dim synthetic vector:
    # the probe times the signature/bucket-join machinery, not a model)
    from littletable_spark.operators.dedup import (
        boilerplate_line_table,
        embedding_signature_table,
        span_gram_table,
    )

    def with_emb(df):
        return df.withColumn(
            "emb",
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("doc_id") + F.lit(i)), F.lit(97))
                    .cast("double")
                    for i in range(8)
                ]
            ),
        )

    root = tempfile.mkdtemp(prefix="lts_probe_idx_")
    for tag, df in (("1x", d1), ("10x", d10)):
        src = Table.from_df(with_emb(df.select("doc_id", "text")))
        minhash_band_table(src, "doc_id", "text").df.withColumn(
            "batch_id", F.lit(-1)
        ).write.parquet(f"{root}/{tag}/bands/batch_id=-1")
        boilerplate_line_table(src, "text", "doc_id").df.withColumn(
            "batch_id", F.lit(-1)
        ).write.parquet(f"{root}/{tag}/lines/batch_id=-1")
        span_gram_table(src, "text", "doc_id").df.withColumn(
            "batch_id", F.lit(-1)
        ).write.parquet(f"{root}/{tag}/grams/batch_id=-1")
        embedding_signature_table(src, "doc_id", "emb", dim=8).df.withColumn(
            "batch_id", F.lit(-1)
        ).write.parquet(f"{root}/{tag}/sigs/batch_id=-1")

    batch = with_emb(
        d1.where(F.pmod(F.col("doc_id"), F.lit(2)) == 1).select(
            "doc_id", "text"
        )
    ).persist()
    batch.count()

    def ingest(tag):
        out = tempfile.mkdtemp(prefix=f"lts_probe_out_{tag}_")
        ingest_batch(
            batch, 7, f"{out}/corpus", f"{root}/{tag}/bands",
            collect_stats=False,
        )

    def ingest_full(tag):
        out = tempfile.mkdtemp(prefix=f"lts_probe_full_{tag}_")
        ingest_batch(
            batch, 7, f"{out}/corpus", f"{root}/{tag}/bands",
            collect_stats=False,
            lines_path=f"{root}/{tag}/lines",
            grams_path=f"{root}/{tag}/grams",
            sigs_path=f"{root}/{tag}/sigs",
            emb_col="emb", emb_dim=8,
        )

    # warm + 3 timed passes each, report median
    meds: dict[str, float] = {}
    for label, fn in (
        ("cap_tokens_1x", lambda: cap_tokens(d1)),
        ("cap_tokens_10x", lambda: cap_tokens(d10)),
        ("skew_report_1x", lambda: skew(o1)),
        ("skew_report_10x", lambda: skew(o10)),
        ("ingest_vs_idx_1x", lambda: ingest("1x")),
        ("ingest_vs_idx_10x", lambda: ingest("10x")),
        ("ingest_full_stack_1x", lambda: ingest_full("1x")),
        ("ingest_full_stack_10x", lambda: ingest_full("10x")),
    ):
        fn()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        meds[label] = sorted(ts)[1]

    for k, v in meds.items():
        print(f"{k}: {v:.2f}s")
    for op in ("cap_tokens", "skew_report", "ingest_vs_idx", "ingest_full_stack"):
        print(f"{op} growth: {meds[op + '_10x'] / meds[op + '_1x']:.2f}x")


if __name__ == "__main__":
    main()
