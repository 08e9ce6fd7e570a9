"""Durable-asset compaction (streaming/maintenance.py): row-multiset
preservation, reader equivalence across every asset kind, manifest-led
crash recovery, and composition with further ingest batches."""

import json
import shutil
import tempfile

import pytest

from littletable_spark import Table
from littletable_spark.streaming.ingest import ingest_batch
from littletable_spark.streaming.maintenance import (
    _MANIFEST,
    _TMP,
    asset_info,
    compact_asset,
    recover_asset,
)

_TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "lambda mu nu xi omicron pi rho sigma tau upsilon",
    "phi chi psi omega one two three four five six",
    "seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen",
]


def _docs(spark, rows):
    t = Table("cmp", spark=spark)
    t.insert_many([{"doc_id": i, "text": txt} for i, txt in rows])
    return t.df.select("doc_id", "text")


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="lts_compact_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _multiset(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _seed(spark, root, n_batches=3):
    corpus, bands, stats = f"{root}/corpus", f"{root}/bands", f"{root}/stats"
    for b in range(n_batches):
        ingest_batch(
            _docs(spark, [(b, _TEXTS[b])]), b, corpus, bands, stats_path=stats
        )
    return corpus, bands, stats


def test_compact_preserves_rows_and_probe_decisions(spark, root):
    """Compacting the band index changes ONLY layout: same row
    multiset, fewer partitions/files, and the next batch's
    against-corpus dedup decisions are identical to an uncompacted
    twin's."""
    corpus, bands, stats = _seed(spark, root)
    twin = f"{root}/twin"
    for sub in ("corpus", "bands", "stats"):
        shutil.copytree(f"{root}/{sub}", f"{twin}/{sub}")

    before_bands = _multiset(spark.read.parquet(bands), ["doc_id"])
    info0 = asset_info(spark, bands)
    assert info0["partitions"] == 3 and not info0["pending_compaction"]

    res = compact_asset(spark, bands)
    assert res["compacted"] == 3 and res["dest"] == "batch_id=-3"
    info1 = asset_info(spark, bands)
    assert info1["partitions"] == 1
    assert info1["files"] < info0["files"]
    assert info1["min_batch_id"] == info1["max_batch_id"] == -3
    assert _multiset(spark.read.parquet(bands), ["doc_id"]) == before_bands

    # next batch: a dup of corpus doc 0 plus a new doc — the compacted
    # index must make the same drop/keep calls as the uncompacted twin
    batch = [(10, _TEXTS[0]), (11, _TEXTS[3])]
    s_c = ingest_batch(_docs(spark, batch), 3, corpus, bands, stats_path=stats)
    s_u = ingest_batch(
        _docs(spark, batch), 3, f"{twin}/corpus", f"{twin}/bands",
        stats_path=f"{twin}/stats",
    )
    assert (s_c["appended"], s_c["dropped"]) == (s_u["appended"], s_u["dropped"]) == (1, 1)
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == {0, 1, 2, 11}


def test_compact_stats_asset_keeps_fold_sums(spark, root):
    """The term-stats reader SUMS rows across partitions; compaction
    (no dedup) must leave the folded corpus statistics bit-identical."""
    from littletable_spark.operators.textops import fold_term_stats

    _, _, stats = _seed(spark, root)
    key = lambda t: sorted(  # noqa: E731
        ((r.term or "", r.df, r.n_docs, r.total_tokens) for r in t)
    )
    before = key(fold_term_stats(Table.parquet_import(spark, stats)))
    compact_asset(spark, stats)
    assert key(fold_term_stats(Table.parquet_import(spark, stats))) == before


def test_compact_upto_batch_id_spares_redeliverable_partitions(spark, root):
    """upto_batch_id= folds only settled partitions, so a redelivered
    recent batch can still overwrite its own directory."""
    corpus, bands, stats = _seed(spark, root)
    res = compact_asset(spark, corpus, upto_batch_id=1)
    assert res["compacted"] == 2
    dirs = asset_info(spark, corpus)
    assert dirs["partitions"] == 2 and dirs["min_batch_id"] == -2
    assert dirs["max_batch_id"] == 2

    # redeliver batch 2: overwrites batch_id=2 in place, corpus stable
    ingest_batch(_docs(spark, [(2, _TEXTS[2])]), 2, corpus, bands, stats_path=stats)
    assert _multiset(spark.read.parquet(corpus), ["doc_id"]) == [(0,), (1,), (2,)]


def test_recompaction_folds_prior_compaction(spark, root):
    """max_generations=1 forces full merges: a second compaction
    absorbs the previous batch_id=-k partition plus the new
    micro-batches into a fresh non-colliding name."""
    corpus, bands, stats = _seed(spark, root)
    compact_asset(spark, bands, max_generations=1)  # -> batch_id=-3
    ingest_batch(_docs(spark, [(7, _TEXTS[3])]), 7, corpus, bands, stats_path=stats)
    res = compact_asset(spark, bands, max_generations=1)
    assert res["compacted"] == 2 and res["dest"] == "batch_id=-8"
    assert asset_info(spark, bands)["partitions"] == 1
    assert {r.doc_id for r in spark.read.parquet(bands).collect()} == {0, 1, 2, 7}


def test_generational_tiering_bounds_rewrite_cost(spark, root):
    """The default behavior is LSM-style: periodic compactions fold
    ONLY newly settled batches into a fresh generation — settled
    generations are not re-read — until max_generations exist, when
    one full merge collapses them. Per-cycle I/O stays proportional
    to new data instead of rewriting the whole asset every cycle."""
    corpus, bands, stats = _seed(spark, root)  # batches 0,1,2
    r1 = compact_asset(spark, bands, max_generations=2)
    assert r1["compacted"] == 3 and r1["dest"] == "batch_id=-3"

    fresh_texts = {
        7: _TEXTS[3],
        8: "red orange yellow green blue indigo violet silver gold bronze",
    }
    for b in (7, 8):
        ingest_batch(
            _docs(spark, [(b, fresh_texts[b])]), b,
            corpus, bands, stats_path=stats,
        )
    # one generation + fresh -> a SECOND generation; gen -3 untouched
    r2 = compact_asset(spark, bands, max_generations=2)
    assert r2["compacted"] == 2 and r2["dest"] == "batch_id=-9"
    info = asset_info(spark, bands)
    assert info["partitions"] == 2 and info["min_batch_id"] == -9

    # two generations at the cap + fresh -> full merge of everything
    ingest_batch(
        _docs(spark, [(11, "mercury venus earth mars jupiter saturn uranus neptune pluto ceres")]),
        11, corpus, bands, stats_path=stats,
    )
    r3 = compact_asset(spark, bands, max_generations=2)
    assert r3["compacted"] == 3 and r3["dest"] == "batch_id=-12"
    assert asset_info(spark, bands)["partitions"] == 1
    assert {r.doc_id for r in spark.read.parquet(bands).collect()} == {
        0, 1, 2, 7, 8, 11,
    }


def test_compact_dedup_collapses_repeated_ivf_model_rows(spark, root):
    """dedup=True: the IVF asset's identical frozen-model rows (one
    copy per batch) collapse to one, and stored-index search over the
    compacted asset still equals exact search."""
    import numpy as np

    from littletable_spark.operators.similarity import cosine_topk, ivf_topk

    corpus, bands = f"{root}/corpus", f"{root}/bands"
    ivf = f"{root}/ivf"
    cents = np.eye(2, 4)
    vecs = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.7, 0.7, 0.0, 0.0]]

    t = Table("e", spark=spark)
    for b in range(3):
        t2 = Table("e", spark=spark)
        t2.insert_many([{"doc_id": b, "text": _TEXTS[b], "emb": vecs[b]}])
        ingest_batch(
            t2.df, b, corpus, bands, emb_col="emb",
            ivf_path=ivf, ivf_centroids=cents,
        )
    n_model_before = spark.read.parquet(ivf).where("corpus_id IS NULL").count()
    assert n_model_before == 6  # 2 centroids x 3 batches

    compact_asset(spark, ivf, dedup=True)
    stored = Table.parquet_import(spark, ivf)
    assert stored.df.where("corpus_id IS NULL").count() == 2

    written = Table.from_df(spark.read.parquet(corpus).select("doc_id", "emb"))
    q = Table.from_df(written.df.where("doc_id = 2"))
    exact = {
        (r.query_id, r.corpus_id, r.rank)
        for r in cosine_topk(written, q, "doc_id", "emb", k=3)
    }
    got = {
        (r.query_id, r.corpus_id, r.rank)
        for r in ivf_topk(
            written, q, "doc_id", "emb", k=3, nprobe=2, against_index=stored
        )
    }
    assert got == exact and got


def test_crash_recovery_replays_manifest(spark, root):
    """A manifest + temp dir left by a mid-swap crash is replayed to
    completion (by recover_asset directly, and by compact_asset's
    entry recovery), never double-counting rows."""
    _, bands, _ = _seed(spark, root)
    before = _multiset(spark.read.parquet(bands), ["doc_id"])

    # simulate the crash window: compacted temp written + manifest
    # published, but no source partition deleted yet
    import glob as _glob
    import os

    srcs = sorted(
        os.path.basename(p) for p in _glob.glob(f"{bands}/batch_id=*")
    )
    spark.read.parquet(
        *[f"{bands}/{s}" for s in srcs]
    ).repartition(1).write.parquet(f"{bands}/{_TMP}")
    with open(f"{bands}/{_MANIFEST}", "w") as fh:
        json.dump({"sources": srcs, "dest": "batch_id=-9"}, fh)

    # Spark readers ignore the dot-dirs, so the asset still reads
    # consistently from the (intact) sources during the crash window
    assert _multiset(spark.read.parquet(bands), ["doc_id"]) == before
    assert asset_info(spark, bands)["pending_compaction"]

    assert recover_asset(spark, bands) is True
    info = asset_info(spark, bands)
    assert info["partitions"] == 1 and info["min_batch_id"] == -9
    assert not info["pending_compaction"]
    assert _multiset(spark.read.parquet(bands), ["doc_id"]) == before
    assert recover_asset(spark, bands) is False  # nothing pending now


def test_stale_tmp_without_manifest_is_discarded(spark, root):
    """A pre-publish crash leaves only the temp dir; the sources are
    authoritative and the garbage is swept on the next compaction."""
    _, bands, _ = _seed(spark, root)
    before = _multiset(spark.read.parquet(bands), ["doc_id"])
    spark.read.parquet(bands).limit(1).write.parquet(f"{bands}/{_TMP}")

    res = compact_asset(spark, bands)
    assert res["compacted"] == 3
    info = asset_info(spark, bands)
    assert info["partitions"] == 1
    assert _multiset(spark.read.parquet(bands), ["doc_id"]) == before


def test_single_partition_is_a_noop(spark, root):
    corpus, bands = f"{root}/corpus", f"{root}/bands"
    ingest_batch(_docs(spark, [(0, _TEXTS[0])]), 0, corpus, bands)
    res = compact_asset(spark, bands)
    assert res["compacted"] == 0 and res["dest"] is None
    assert asset_info(spark, bands)["partitions"] == 1


def test_ingest_heals_interrupted_compaction_before_probing(spark, root):
    """The dangerous crash window: manifest published, some source
    partitions already deleted, compacted rows still invisible in the
    temp dir. A plain read would miss settled docs and re-admit their
    duplicates — ingest_batch must replay the swap BEFORE its first
    probe, so the dedup decision matches a never-crashed run."""
    import glob as _glob
    import os

    corpus, bands, stats = _seed(spark, root)
    srcs = sorted(os.path.basename(p) for p in _glob.glob(f"{bands}/batch_id=*"))
    spark.read.parquet(*[f"{bands}/{s}" for s in srcs]).repartition(1).write.parquet(
        f"{bands}/{_TMP}"
    )
    with open(f"{bands}/{_MANIFEST}", "w") as fh:
        json.dump({"sources": srcs, "dest": "batch_id=-4"}, fh)
    shutil.rmtree(f"{bands}/{srcs[0]}")  # partial delete: doc 0's bands gone

    # a dup of doc 0 (whose band rows are ONLY recoverable via the
    # manifest replay) plus a new doc
    s = ingest_batch(
        _docs(spark, [(20, _TEXTS[0]), (21, _TEXTS[3])]), 20,
        corpus, bands, stats_path=stats,
    )
    assert (s["appended"], s["dropped"]) == (1, 1)
    info = asset_info(spark, bands)
    assert not info["pending_compaction"]
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == {0, 1, 2, 21}


def test_schema_drift_guard_and_migration(spark, root):
    """A mid-crawl batch carrying a new column must not silently
    vanish from plain corpus reads: ingest fails loudly by default,
    allow_schema_drift=True permits the write, and
    compact_asset(merge_schema=True) is the migration that makes the
    union schema visible to single-footer reads again."""
    corpus, bands = f"{root}/corpus", f"{root}/bands"
    ingest_batch(_docs(spark, [(0, _TEXTS[0])]), 0, corpus, bands)

    drifted = Table("d", spark=spark)
    drifted.insert_many([{"doc_id": 5, "text": _TEXTS[1], "lang": "en"}])
    dd = drifted.df.select("doc_id", "text", "lang")

    with pytest.raises(ValueError, match="schema drifted"):
        ingest_batch(dd, 1, corpus, bands)

    s = ingest_batch(dd, 1, corpus, bands, allow_schema_drift=True)
    assert s["appended"] == 1
    # the hazard the guard exists for: plain read misses the new column
    assert "lang" not in spark.read.parquet(corpus).columns

    compact_asset(spark, corpus, merge_schema=True, max_generations=1)
    got = spark.read.parquet(corpus)
    assert "lang" in got.columns
    assert {(r.doc_id, r.lang) for r in got.collect()} == {
        (0, None), (5, "en"),
    }

    # post-migration: batches in the NEW schema pass the guard
    t3 = Table("d3", spark=spark)
    t3.insert_many([{"doc_id": 9, "text": _TEXTS[2], "lang": "de"}])
    s3 = ingest_batch(
        t3.df.select("doc_id", "text", "lang"), 2, corpus, bands
    )
    assert s3["appended"] == 1


def test_compact_refuses_heterogeneous_schemas_without_merge(spark, root):
    """A plain fold across drifted partitions would resolve one
    arbitrary footer's schema, silently drop the other partitions'
    extra columns, and then DELETE their only copies — refused
    outright unless merge_schema=True."""
    corpus, bands = f"{root}/corpus", f"{root}/bands"
    ingest_batch(_docs(spark, [(0, _TEXTS[0])]), 0, corpus, bands)
    drifted = Table("dh", spark=spark)
    drifted.insert_many([{"doc_id": 5, "text": _TEXTS[1], "lang": "en"}])
    ingest_batch(
        drifted.df.select("doc_id", "text", "lang"), 1, corpus, bands,
        allow_schema_drift=True,
    )
    with pytest.raises(ValueError, match="DIFFERENT"):
        compact_asset(spark, corpus)
    # nothing was deleted by the refusal
    assert asset_info(spark, corpus)["partitions"] == 2
    # the migration path still works
    compact_asset(spark, corpus, merge_schema=True, max_generations=1)
    assert "lang" in spark.read.parquet(corpus).columns


def test_schema_guard_catches_type_drift(spark, root):
    corpus, bands = f"{root}/corpus", f"{root}/bands"
    ingest_batch(_docs(spark, [(0, _TEXTS[0])]), 0, corpus, bands)
    from pyspark.sql import functions as F

    retyped = _docs(spark, [(7, _TEXTS[1])]).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    with pytest.raises(ValueError, match="retyped"):
        ingest_batch(retyped, 1, corpus, bands)


def test_missing_asset_is_empty_not_java_error(spark, root):
    """asset_info/compact_asset on a path that does not exist yet (before
    the first ingest batch, or mistyped) must return an empty result, not
    a raw Java FileNotFoundException. (ADVICE r7)"""
    ghost = f"{root}/never_ingested"
    info = asset_info(spark, ghost)
    assert info["partitions"] == 0 and info["files"] == 0
    stats = compact_asset(spark, ghost)
    assert stats["compacted"] == 0
