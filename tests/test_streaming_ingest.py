"""Curated-ingestion sink: per-batch dedup against the durable band
index, idempotent partition-overwrite writes, and the true
foreachBatch/readStream path (streaming/ingest.py)."""

import shutil
import tempfile

import pytest

from littletable_spark import Table
from littletable_spark.streaming.ingest import ingest_batch, start_curated_ingest

# distinct word-soup texts: no shared 3-gram shingles between different
# bases, so MinHash(8 hashes) separates them and exact copies collide
_BASE = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "lambda mu nu xi omicron pi rho sigma tau upsilon",
    "phi chi psi omega one two three four five six",
]


def _docs(spark, rows):
    t = Table("ing", spark=spark)
    t.insert_many([{"doc_id": i, "text": txt} for i, txt in rows])
    return t.df.select("doc_id", "text")


@pytest.fixture()
def paths():
    root = tempfile.mkdtemp(prefix="lts_ingest_")
    yield f"{root}/corpus", f"{root}/bands", f"{root}/ckpt", f"{root}/stage"
    shutil.rmtree(root, ignore_errors=True)


def test_ingest_batch_dedups_within_and_against_corpus(spark, paths):
    """Batch 0 seeds the corpus + index; batch 1 drops its within-batch
    dup (greedy larger-id) and its dup of a CORPUS doc via the stored
    index — without rescanning corpus text."""
    corpus, bands, _, _ = paths

    s0 = ingest_batch(
        _docs(spark, [(1, _BASE[0]), (2, _BASE[1])]), 0, corpus, bands
    )
    assert (s0["received"], s0["appended"]) == (2, 2)

    # 3 = copy of corpus doc 1; 4 = new; 5 = within-batch copy of 4
    s1 = ingest_batch(
        _docs(spark, [(3, _BASE[0]), (4, _BASE[2]), (5, _BASE[2])]),
        1,
        corpus,
        bands,
    )
    assert (s1["received"], s1["appended"], s1["dropped"]) == (3, 1, 2)

    got = spark.read.parquet(corpus)
    assert {r.doc_id for r in got.collect()} == {1, 2, 4}
    # batch_id comes back as a partition column (lineage for free)
    assert dict((r.doc_id, r.batch_id) for r in got.collect()) == {
        1: 0, 2: 0, 4: 1,
    }
    # the index grew by exactly the survivors' band rows
    idx = spark.read.parquet(bands)
    assert {r.doc_id for r in idx.collect()} == {1, 2, 4}


def test_ingest_batch_redelivery_is_idempotent(spark, paths):
    """Re-running a batch id must overwrite its own partition with the
    SAME rows — in particular the stored index already contains the
    batch's own band rows, and probing them would match every doc
    against itself and wipe the partition."""
    corpus, bands, _, _ = paths

    ingest_batch(_docs(spark, [(1, _BASE[0])]), 0, corpus, bands)
    ingest_batch(_docs(spark, [(2, _BASE[1])]), 1, corpus, bands)
    before = {(r.doc_id, r.batch_id) for r in spark.read.parquet(corpus).collect()}

    s = ingest_batch(_docs(spark, [(2, _BASE[1])]), 1, corpus, bands)  # redelivery
    assert s["appended"] == 1  # NOT dropped against its own index rows
    after = {(r.doc_id, r.batch_id) for r in spark.read.parquet(corpus).collect()}
    assert after == before == {(1, 0), (2, 1)}
    assert {r.doc_id for r in spark.read.parquet(bands).collect()} == {1, 2}


def test_start_curated_ingest_foreachbatch_stream(spark, paths):
    """The true streaming path: a file source drained with
    availableNow + maxFilesPerTrigger=1 feeds ingest_batch one staged
    file per micro-batch; the resulting corpus matches what the same
    files produce through direct ingest_batch calls."""
    corpus, bands, ckpt, stage = paths

    # stage two parquet "crawl drops"; second contains a dup of the first
    _docs(spark, [(1, _BASE[0]), (2, _BASE[1])]).coalesce(1).write.parquet(
        f"{stage}/f0"
    )
    _docs(spark, [(3, _BASE[0]), (4, _BASE[2])]).coalesce(1).write.parquet(
        f"{stage}/f1"
    )
    schema = spark.read.parquet(f"{stage}/f0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/f*/")
    )
    q = start_curated_ingest(stream, corpus, bands, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(corpus)
    ids = {r.doc_id for r in got.collect()}
    assert 4 in ids and len(ids) == 3  # one of {1,3} was deduped away
    assert ids in ({1, 2, 4}, {2, 3, 4})  # file order decides which
    assert {r.doc_id for r in spark.read.parquet(bands).collect()} == ids
