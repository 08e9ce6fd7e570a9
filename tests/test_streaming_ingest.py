"""Curated-ingestion sink: per-batch dedup against the durable band
index, idempotent partition-overwrite writes, and the true
foreachBatch/readStream path (streaming/ingest.py)."""

import os
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


# ---------------------------------------------------------------- #
# multi-stage sink: line strip + span cut + minhash + embedding    #
# ---------------------------------------------------------------- #

_V_A = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
_V_B = [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
_V_C = [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
_V_A2 = [0.999, 0.01, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]  # cos(A, A2) ~ 1
_V_D = [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0]


def _edocs(spark, rows):
    t = Table("eing", spark=spark)
    t.insert_many(
        [{"doc_id": i, "text": txt, "emb": vec} for i, txt, vec in rows]
    )
    return t.df.select("doc_id", "text", "emb")


def _stage_kw(root):
    return dict(
        lines_path=f"{root}/lines",
        line_min_docs=1,
        grams_path=f"{root}/grams",
        span_k=4,
        sigs_path=f"{root}/sigs",
        emb_col="emb",
        emb_dim=8,
    )


_SPAN_RUN = "q1 q2 q3 q4 q5 q6 q7 q8"  # 8 tokens >= span_k + 1 grams


def test_multi_stage_ingest_full_curation_stack(spark, paths):
    corpus, bands, _, _ = paths
    root = corpus.rsplit("/", 1)[0]
    kw = _stage_kw(root)

    s0 = ingest_batch(
        _edocs(
            spark,
            [
                (1, _BASE[0] + "\nfooter line here", _V_A),
                (2, _BASE[1] + "\n" + _SPAN_RUN, _V_B),
            ],
        ),
        0, corpus, bands, **kw,
    )
    assert (s0["received"], s0["appended"]) == (2, 2)
    # all four indexes seeded
    assert spark.read.parquet(kw["lines_path"]).count() > 0
    assert spark.read.parquet(kw["grams_path"]).count() > 0
    assert spark.read.parquet(kw["sigs_path"]).count() == 2

    s1 = ingest_batch(
        _edocs(
            spark,
            [
                # line from corpus -> stripped, doc survives cleaned
                (3, "own words entirely fresh\nfooter line here", _V_C),
                # every line known to corpus -> doc drops at line stage
                (4, "footer line here", _V_D),
                # 8-token span from corpus doc 2 -> cut BEFORE minhash,
                # so the doc survives with its own tokens only
                (5, "novel opening statement tokens " + _SPAN_RUN, _V_D),
                # wholly-copied doc: IDENTICAL token stream to corpus
                # doc 1 but single-line (newline -> space), so no line
                # is verbatim-known and the line stage passes it; the
                # span stage cuts its ENTIRE text (every 4-gram is in
                # the stored gram table) and the empty doc drops there.
                # (The minhash band probe — covered by the single-stage
                # tests above — is the safety net for fuzzy dups whose
                # copied runs are shorter than span_k.)
                (6, _BASE[0] + " footer line here", _V_D),
                # embedding near-dup of corpus doc 1 (distinct text)
                (7, _BASE[2], _V_A2),
            ],
        ),
        1, corpus, bands, **kw,
    )
    assert s1["received"] == 5
    assert s1["after_line_strip"] == 4        # doc 4 gone
    assert s1["after_span_cut"] == 3          # doc 6 cut to nothing
    assert s1["after_minhash"] == 3           # nothing left for bands here
    assert s1["after_embedding"] == 2         # doc 7 gone
    assert s1["appended"] == 2 and s1["dropped"] == 3

    got = {r.doc_id: r.text for r in spark.read.parquet(corpus).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[3] == "own words entirely fresh"          # line stripped
    assert got[5] == "novel opening statement tokens"    # span cut
    # every enabled index extended with batch-1 survivors only
    sigs = spark.read.parquet(kw["sigs_path"])
    assert {r.doc_id for r in sigs.collect()} == {1, 2, 3, 5}


def test_multi_stage_redelivery_is_idempotent(spark, paths):
    """Re-running a batch with every stage enabled must reproduce the
    same survivors: each stage's stored-index probe excludes the
    batch's own partition (lines/grams would strip every doc's text to
    nothing; sigs/bands would self-match every doc)."""
    corpus, bands, _, _ = paths
    root = corpus.rsplit("/", 1)[0]
    kw = _stage_kw(root)

    ingest_batch(
        _edocs(spark, [(1, _BASE[0] + "\nfooter line here", _V_A)]),
        0, corpus, bands, **kw,
    )
    b1 = [(2, _BASE[1] + "\n" + _SPAN_RUN, _V_B), (3, _BASE[2], _V_C)]
    s = ingest_batch(_edocs(spark, b1), 1, corpus, bands, **kw)
    before_corpus = {
        (r.doc_id, r.batch_id, r.text)
        for r in spark.read.parquet(corpus).collect()
    }
    before_sigs = {r.doc_id for r in spark.read.parquet(kw["sigs_path"]).collect()}

    s2 = ingest_batch(_edocs(spark, b1), 1, corpus, bands, **kw)  # redelivery
    assert s2["appended"] == s["appended"] == 2
    after_corpus = {
        (r.doc_id, r.batch_id, r.text)
        for r in spark.read.parquet(corpus).collect()
    }
    assert after_corpus == before_corpus
    assert {r.doc_id for r in spark.read.parquet(kw["sigs_path"]).collect()} == before_sigs


def test_sigs_path_requires_emb_col(spark, paths):
    corpus, bands, _, _ = paths
    with pytest.raises(ValueError, match="emb_col"):
        ingest_batch(
            _docs(spark, [(1, _BASE[0])]), 0, corpus, bands,
            sigs_path="/tmp/nope",
        )


def test_ivf_path_maintains_searchable_ann_index(spark, paths):
    """the sink's ivf_path stage: the per-batch frozen-model
    assignments read back as one searchable ivf_index_table whose
    rows equal a whole-corpus frozen build, and searching it at
    nprobe == nlist is exact; redelivery keeps the asset stable."""
    import numpy as np

    from littletable_spark.operators.similarity import (
        cosine_topk,
        ivf_index_table,
        ivf_topk,
    )

    corpus, bands, _, _ = paths
    root = corpus.rsplit("/", 1)[0]
    ivf_p = f"{root}/ivf"
    cents = np.eye(3, 8)  # frozen 3-list model over dim 8
    kw = dict(emb_col="emb", ivf_path=ivf_p, ivf_centroids=cents)

    b1 = [(0, _BASE[0], _V_A), (1, _BASE[1], _V_B)]
    b2 = [(2, _BASE[2], _V_C), (3, _BASE[0], _V_D)]  # 3 = text dup of 0
    ingest_batch(_edocs(spark, b1), 0, corpus, bands, **kw)
    s2 = ingest_batch(_edocs(spark, b2), 1, corpus, bands, **kw)
    assert s2["appended"] == 1  # doc 3 dropped by the band probe

    stored = Table.parquet_import(spark, ivf_p)
    written = Table.from_df(
        spark.read.parquet(corpus).select("doc_id", "emb")
    )
    frozen = ivf_index_table(written, "doc_id", "emb", centroids=cents)
    # set key: the stored asset repeats the (identical) model rows in
    # every batch partition; they collapse here exactly as they do in
    # _load_ivf_index
    key = lambda t: sorted(  # noqa: E731
        {
            (
                r.cluster,
                -1 if r.corpus_id is None else r.corpus_id,
                tuple(round(x, 12) for x in (r.centroid or r.cvec or ())),
            )
            for r in t
        }
    )
    stored_key = key(stored)
    assert stored_key == key(frozen)

    q = Table.from_df(written.df.where("doc_id = 0"))
    exact = {
        (r.query_id, r.corpus_id, r.cosine, r.rank)
        for r in cosine_topk(written, q, "doc_id", "emb", k=3)
    }
    got = {
        (r.query_id, r.corpus_id, r.cosine, r.rank)
        for r in ivf_topk(
            written, q, "doc_id", "emb", k=3, nprobe=3, against_index=stored
        )
    }
    assert got == exact and got

    ingest_batch(_edocs(spark, b2), 1, corpus, bands, **kw)  # redelivery
    assert key(Table.parquet_import(spark, ivf_p)) == stored_key


def test_ivf_path_requires_model(spark, paths):
    corpus, bands, _, _ = paths
    with pytest.raises(ValueError, match="ivf_centroids"):
        ingest_batch(
            _edocs(spark, [(0, _BASE[0], _V_A)]), 0, corpus, bands,
            emb_col="emb", ivf_path=f"{corpus}_ivf",
        )


def test_start_curated_ingest_self_compacting(spark, paths):
    """compact_every= makes the sink fold settled partitions inline:
    after draining 5 staged files with compact_every=2 / horizon=2,
    the corpus content equals the plain-sink run, the band probe still
    makes the same decisions, and the layout shows a compacted
    (negative-id) partition plus only the horizon's recent batches."""
    from littletable_spark.streaming.maintenance import asset_info

    corpus, bands, ckpt, stage = paths
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
        "phi chi psi omega one two three four five six",
        "seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen",
        "apple banana cherry date elderberry fig grape honeydew kiwi lemon",
    ]
    for i, txt in enumerate(texts):
        _docs(spark, [(i, txt)]).coalesce(1).write.parquet(f"{stage}/f{i}")
    schema = spark.read.parquet(f"{stage}/f0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/f*/")
    )
    q = start_curated_ingest(
        stream, corpus, bands, ckpt, compact_every=2, compact_horizon=2
    )
    q.awaitTermination(180)

    # all five texts are mutually non-duplicate: content is complete
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == set(
        range(5)
    )
    assert {r.doc_id for r in spark.read.parquet(bands).collect()} == set(
        range(5)
    )
    info = asset_info(spark, corpus)
    # batch 4 triggered the last fold (upto 2): batches 0-2 compacted,
    # 3 and 4 still inside the horizon as their own partitions
    assert info["min_batch_id"] < 0
    assert info["partitions"] == 3, info
    assert not info["pending_compaction"]

    # the folded index still drives dedup: a dup of doc 0 (inside the
    # compacted partition) is dropped by the band probe
    s = ingest_batch(_docs(spark, [(9, texts[0])]), 9, corpus, bands)
    assert (s["appended"], s["dropped"]) == (0, 1)


def test_ivf_path_pq_layout(spark, paths):
    """ivf_codebooks switches the durable ANN asset to the PQ layout:
    batches append m-byte codes, the stored asset searches through the
    PQ path, and at nprobe == nlist with corpus-covering rerank the
    result is exact."""
    import numpy as np

    from littletable_spark.operators.similarity import (
        _train_pq_codebooks,
        cosine_topk,
        ivf_topk,
    )

    corpus, bands, _, _ = paths
    root = corpus.rsplit("/", 1)[0]
    ivf_p = f"{root}/ivf_pq"
    cents = np.eye(3, 8)
    rng = np.random.RandomState(3)
    books = _train_pq_codebooks(rng.randn(64, 8), m=4, ksub=8, seed=5)
    kw = dict(
        emb_col="emb", ivf_path=ivf_p, ivf_centroids=cents,
        ivf_codebooks=books,
    )
    b1 = [(0, _BASE[0], _V_A), (1, _BASE[1], _V_B)]
    b2 = [(2, _BASE[2], _V_C)]
    ingest_batch(_edocs(spark, b1), 0, corpus, bands, **kw)
    ingest_batch(_edocs(spark, b2), 1, corpus, bands, **kw)

    stored = Table.parquet_import(spark, ivf_p)
    assert "codes" in stored.fields and "cvec" not in stored.fields
    written = Table.from_df(
        spark.read.parquet(corpus).select("doc_id", "emb")
    )
    q = Table.from_df(written.df.where("doc_id = 0"))
    exact = {
        (r.query_id, r.corpus_id, r.cosine, r.rank)
        for r in cosine_topk(written, q, "doc_id", "emb", k=3)
    }
    got = {
        (r.query_id, r.corpus_id, r.cosine, r.rank)
        for r in ivf_topk(
            written, q, "doc_id", "emb", k=3, nprobe=3,
            against_index=stored, rerank=100,
        )
    }
    assert got == exact and got


def test_ivf_pq_asset_compacts_with_dedup(spark, paths):
    """compact_asset(dedup=True) over a PQ asset: the per-batch
    repeated model rows (centroids + codebooks) collapse to one copy,
    binary code rows distinct cleanly, and the compacted asset
    searches identically."""
    import numpy as np

    from littletable_spark.operators.similarity import (
        _train_pq_codebooks,
        ivf_topk,
    )
    from littletable_spark.streaming.maintenance import asset_info, compact_asset

    corpus, bands, _, _ = paths
    root = corpus.rsplit("/", 1)[0]
    ivf_p = f"{root}/ivf_pq_c"
    cents = np.eye(3, 8)
    books = _train_pq_codebooks(np.random.RandomState(3).randn(64, 8), m=4, ksub=8, seed=5)
    kw = dict(emb_col="emb", ivf_path=ivf_p, ivf_centroids=cents, ivf_codebooks=books)
    ingest_batch(_edocs(spark, [(0, _BASE[0], _V_A), (1, _BASE[1], _V_B)]), 0, corpus, bands, **kw)
    ingest_batch(_edocs(spark, [(2, _BASE[2], _V_C)]), 1, corpus, bands, **kw)

    written = Table.from_df(spark.read.parquet(corpus).select("doc_id", "emb"))
    q = Table.from_df(written.df.where("doc_id = 0"))

    def search(idx):
        return sorted(
            (r.query_id, r.corpus_id, r.cosine, r.rank)
            for r in ivf_topk(
                written, q, "doc_id", "emb", k=3, nprobe=3,
                against_index=idx, rerank=100,
            )
        )

    before = search(Table.parquet_import(spark, ivf_p))
    stats = compact_asset(spark, ivf_p, dedup=True, max_generations=1)
    assert stats["compacted"] == 2
    info = asset_info(spark, ivf_p)
    assert info["partitions"] == 1
    after_tbl = Table.parquet_import(spark, ivf_p)
    # model rows collapsed to exactly one copy each
    from pyspark.sql import functions as F

    n_model = after_tbl.df.where(F.col("corpus_id").isNull()).count()
    assert n_model == 3 + 4 * 8  # nlist + m*ksub
    assert search(after_tbl) == before and before


def test_concurrent_asset_write_failure_propagates(spark, paths):
    """The per-batch asset writes run overlapped on a thread pool; a
    failing write must still fail ingest_batch itself (f.result()
    re-raises), not vanish into a worker thread."""
    corpus, bands, _, stage = paths
    # make the stats asset root an unwritable location: a regular FILE
    # where the writer needs a directory
    os.makedirs(stage, exist_ok=True)
    stats_file = f"{stage}/stats_as_file"
    with open(stats_file, "w") as fh:
        fh.write("not a directory")
    with pytest.raises(Exception):
        ingest_batch(
            _docs(spark, [(1, _BASE[0]), (2, _BASE[1])]),
            0,
            corpus,
            bands,
            stats_path=f"{stats_file}/stats",
        )
    # the pool drained cleanly: a following good batch works end-to-end
    s = ingest_batch(
        _docs(spark, [(3, _BASE[2])]), 1, corpus, bands
    )
    assert s["appended"] == 1
