"""The nightly-crawl lifecycle end to end: curated streaming ingest
over durable indexes -> asset compaction -> retrieval and ANN search
against the stored assets -> model-based quality filtering.

Everything a long-running corpus pipeline does between crawls, using
only the durable parquet assets — the settled corpus text is never
re-shingled, re-tokenized, or re-embedded.

Run: python examples/nightly_ingest_demo.py [sf_dir]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from littletable_spark import Table, get_spark
from littletable_spark.operators.classifier import (
    filter_by_classifier,
    train_text_classifier,
    score_text_classifier,
)
from littletable_spark.operators.textops import (
    bm25_topk,
    fold_term_stats,
    quality_score,
)
from littletable_spark.streaming.ingest import ingest_batch
from littletable_spark.streaming.maintenance import asset_info, compact_asset

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main():
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="nightly_demo_")
    corpus, bands, stats = f"{root}/corpus", f"{root}/bands", f"{root}/stats"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )

    # --- "nightly" micro-batches: dedup against the settled corpus,
    # extend the band index and the retrieval statistics per batch
    for night in range(4):
        batch = docs.where(F.pmod("doc_id", F.lit(4)) == night)
        s = ingest_batch(batch, night, corpus, bands, stats_path=stats)
        print(
            f"night {night}: received {s['received']}, "
            f"appended {s['appended']}, dropped {s['dropped']}"
        )

    # --- maintenance window: fold the accreted tiny partitions
    print("layout before:", asset_info(spark, bands))
    for p in (corpus, bands, stats):
        compact_asset(spark, p)
    print("layout after: ", asset_info(spark, bands))

    # --- retrieval against the STORED stats: corpus never re-tokenized
    folded = fold_term_stats(Table.parquet_import(spark, stats))
    kept = Table.from_df(spark.read.parquet(corpus))
    hits = bm25_topk(
        kept, "text", "doc_id", "data quality systems", k=5,
        against_stats=folded,
    )
    print("bm25 over stored stats:")
    print(hits.as_markdown())

    # --- model-based quality filter: heuristic features label a crude
    # training set, the trained model deploys as a pure-JVM scorer
    feats = quality_score(kept, "text", "doc_id")
    labeled = Table.from_df(
        feats.df.join(kept.df.select("doc_id", "text"), "doc_id").withColumn(
            "label", (F.col("quality") > 0.55).cast("int")
        )
    )
    model = train_text_classifier(labeled, "text", "label", n_features=1 << 12)
    scored = score_text_classifier(
        labeled, model, "text", "doc_id", decision_col="keep"
    )
    n_keep = scored.df.where("keep = 1").count()
    print(f"text classifier keeps {n_keep}/{len(scored)} documents")

    # the linear variant over the heuristic feature columns
    survivors = filter_by_classifier(
        feats, {"n_tokens": 0.02, "punct_ratio": -12.0}, intercept=-0.5
    )
    print(f"linear feature filter keeps {len(survivors)}/{len(feats)}")


if __name__ == "__main__":
    main()
