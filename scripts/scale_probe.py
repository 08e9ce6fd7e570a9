"""Scale probe: do the headline plans survive a 10x data blow-up?

Synthesizes ~sf1 in memory (union of sf0.1 lineitem/orders with shifted
keys, 10 copies) and times representative operators at 1x vs 10x. A
scale-safe plan should grow ~linearly; a super-linear jump flags a
bottleneck (single-partition stage, driver materialization, quadratic
kernel). Usage: python scripts/scale_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from littletable_spark import Table, get_spark

SF_DIR = "/root/testdata/sf0.1"
COPIES = 10


def blow_up(df, key_cols: list[str], copies: int):
    """Union `copies` shifted replicas — distinct keys per replica."""
    out = None
    for i in range(copies):
        rep = df
        for k in key_cols:
            rep = rep.withColumn(k, F.col(k) + F.lit(i * 100_000_000))
        out = rep if out is None else out.unionByName(rep)
    return out


def timed(label, fn, results):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    results[label] = dt
    return dt


def main() -> None:
    spark = get_spark(cpus=32)
    li1 = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o1 = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # Pin every synthetic input before timing: the 10x frames are
    # 10-way union + per-replica transforms, and leaving that plan live
    # inside the timed queries measures corpus SYNTHESIS (itself 10x
    # work) on top of the operator — the round-5/6 jaccard_10x row
    # swung 3.0-6.4s for exactly this reason. Persist + count fixes the
    # probe to measure operator growth alone (the controlled
    # jaccard_probe.py methodology, now applied probe-wide).
    li10 = blow_up(li1, ["l_orderkey"], COPIES).persist()
    o10 = blow_up(o1, ["o_orderkey", "o_custkey"], COPIES).persist()
    li1 = li1.persist()
    o1 = o1.persist()
    for _df in (li1, o1, li10, o10):
        _df.count()

    def q1(df):
        return (
            df.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                F.avg("l_quantity"),
                F.count(F.lit(1)),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def join_agg(li, o):
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def topk(o):
        return (
            o.orderBy(F.col("o_totalprice").desc()).limit(100)
            .write.format("noop").mode("overwrite").save()
        )

    def window_topk(o):
        from pyspark.sql import Window

        w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
        return (
            o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
            .write.format("noop").mode("overwrite").save()
        )

    def minhash(sf_docs):
        from littletable_spark.operators.dedup import minhash_lsh_pairs

        t = Table.from_df(sf_docs)
        minhash_lsh_pairs(t, "doc_id", "text").df.write.format("noop").mode(
            "overwrite"
        ).save()

    def jaccard(docs):
        from littletable_spark.operators.dedup import ngram_jaccard_pairs

        t = Table.from_df(docs)
        ngram_jaccard_pairs(t, "doc_id", "text", threshold=0.8).df.write.format(
            "noop"
        ).mode("overwrite").save()

    def clusters(pairs_df):
        from littletable_spark.operators.dedup import dup_clusters

        dup_clusters(pairs_df, "id1", "id2").write.format("noop").mode(
            "overwrite"
        ).save()

    def emb_lsh(emb, n_planes=6, probe_bits=0):
        from littletable_spark.operators.dedup import embedding_lsh_dup_pairs

        # in-bucket work is O(N²/2^planes): the scale knob is the plane
        # count, raised with N to hold per-bucket density constant
        # (n_planes ≈ log2(N / target_bucket_size)). probe_bits=1 is the
        # multiprobe variant: planes can go higher (cheaper buckets)
        # while distance-1 probing holds recall.
        t = Table.from_df(emb)
        embedding_lsh_dup_pairs(
            t, "vec_id", "embedding", threshold=0.3, n_planes=n_planes,
            probe_bits=probe_bits,
        ).df.write.format("noop").mode("overwrite").save()

    def semantic(emb, k):
        from littletable_spark.operators.dedup import semantic_dup_pairs
        from littletable_spark.operators.similarity import cluster_embeddings

        # in-cluster work is Σ n_c² ≈ N²/k: like LSH's plane count, k is
        # the scale knob and grows with N (k ∝ N holds per-cluster size
        # constant — the SemDeDup paper runs ~100k clusters at billions
        # of docs). Probe: k=8 at 1x vs k=80 at 10x, the honest shape.
        t = Table.from_df(emb)
        cl = cluster_embeddings(t, "vec_id", "embedding", k=k, train_iters=4)
        semantic_dup_pairs(
            t, "vec_id", "embedding", threshold=0.3, clusters=cl
        ).df.write.format("noop").mode("overwrite").save()

    def pack(docs):
        from littletable_spark.operators.textops import pack_sequences

        t = Table.from_df(docs)
        pack_sequences(t, "text", "doc_id", budget_tokens=512, n_shards=16)\
            .df.write.format("noop").mode("overwrite").save()

    def contamination(docs):
        from littletable_spark.operators.textops import contamination_check

        t = Table.from_df(docs)
        bench = Table.from_df(docs.where(F.pmod(F.col("doc_id"), F.lit(17)) == 0))
        corpus = Table.from_df(docs.where(F.pmod(F.col("doc_id"), F.lit(17)) != 0))
        contamination_check(corpus, bench, "doc_id", "doc_id", n=8)\
            .df.write.format("noop").mode("overwrite").save()

    def fquality(docs):
        from littletable_spark.operators.textops import filter_quality

        t = Table.from_df(docs)
        filter_quality(t, "text", "doc_id").df.write.format("noop").mode(
            "overwrite"
        ).save()

    def capgrp(docs):
        from littletable_spark.operators.sampling import cap_per_group

        t = Table.from_df(docs)
        cap_per_group(t, "source", 10, key_col="doc_id", salt="probe")\
            .df.write.format("noop").mode("overwrite").save()

    def asof(ev, orders):
        # keyed as-of: union-the-streams + one window pass per
        # (user) partition — the scale axis is the user count, which
        # the 10x corpus multiplies while per-user stream length stays
        # constant (the production shape for event enrichment)
        from littletable_spark.operators.joins import asof_join

        asof_join(
            Table.from_df(ev), Table.from_df(orders), "ts_sec", "ot",
            by={"user_id": "user_id"}, right_cols=["last_orderkey"],
        ).df.write.format("noop").mode("overwrite").save()

    def contamination_fixed_bench(bench_docs, corpus_docs):
        # the production asymmetry: a FIXED small eval set vs a growing
        # corpus — growth across corpus sizes should be ~the corpus
        # scan, since the bench broadcast and final join are constant
        from littletable_spark.operators.textops import contamination_check

        bench = Table.from_df(
            bench_docs.where(F.pmod(F.col("doc_id"), F.lit(17)) == 0)
        )
        corpus = Table.from_df(corpus_docs)
        contamination_check(corpus, bench, "doc_id", "doc_id", n=8)\
            .df.write.format("noop").mode("overwrite").save()

    def emb_lsh_pairs_found(emb, n_planes, probe_bits=0):
        from littletable_spark.operators.dedup import embedding_lsh_dup_pairs

        t = Table.from_df(emb)
        return embedding_lsh_dup_pairs(
            t, "vec_id", "embedding", threshold=0.3, n_planes=n_planes,
            probe_bits=probe_bits,
        ).df.count()

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # replica-perturbed corpora: identical replicas would create
    # cross-replica near-dup pairs (quadratic in COPIES — a data
    # artifact, not a plan property). A per-replica letter rotation
    # (COPIES distinct rotations) / array rotation give each replica
    # distinct shingles / vectors so pair volume and candidate structure
    # stay ~linear, which is what the probe measures.
    LETTERS = "aeiousnrtl"  # len >= COPIES: all rotations distinct
    docs10_p = None
    for i in range(COPIES):
        rot = LETTERS[i:] + LETTERS[:i]
        rep = docs1.withColumn("text", F.translate(F.col("text"), LETTERS, rot))
        rep = rep.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100_000_000))
        docs10_p = rep if docs10_p is None else docs10_p.unionByName(rep)
    docs1 = docs1.persist()
    docs10_p = docs10_p.persist()
    docs10 = docs10_p
    docs1.count(), docs10.count()

    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb10 = None
    for i in range(COPIES):
        k = i % 64
        rep = emb1.withColumn(
            "embedding",
            F.concat(
                F.slice(F.col("embedding"), k + 1, 64 - k),
                F.slice(F.col("embedding"), 1, k),
            ),
        ).withColumn("vec_id", F.col("vec_id") + F.lit(i * 100_000_000))
        emb10 = rep if emb10 is None else emb10.unionByName(rep)
    emb1 = emb1.persist()
    emb10 = emb10.persist()
    emb1.count(), emb10.count()

    from littletable_spark.operators.dedup import minhash_lsh_pairs

    pairs1 = minhash_lsh_pairs(
        Table.from_df(docs1), "doc_id", "text"
    ).df.persist()
    pairs10 = minhash_lsh_pairs(
        Table.from_df(docs10_p), "doc_id", "text"
    ).df.persist()
    pairs1.count(), pairs10.count()

    # warm up plans at BOTH scales (steady-state methodology, same as
    # bench.py: JIT/codegen + the jaccard adaptive-stat decision are
    # one-time costs, not per-call plan costs)
    q1(li1); join_agg(li1, o1); topk(o1); window_topk(o1); minhash(docs1)
    jaccard(docs1); clusters(pairs1); emb_lsh(emb1)
    q1(li10); join_agg(li10, o10); topk(o10); window_topk(o10)
    minhash(docs10); jaccard(docs10_p); clusters(pairs10)
    emb_lsh(emb10, n_planes=9)
    emb_lsh(emb10, n_planes=12, probe_bits=1)
    semantic(emb1, k=8); semantic(emb10, k=80)
    pack(docs1); pack(docs10); contamination(docs1); contamination(docs10)

    results: dict[str, float] = {}
    timed("q1_agg_1x", lambda: q1(li1), results)
    timed("q1_agg_10x", lambda: q1(li10), results)
    timed("join_agg_1x", lambda: join_agg(li1, o1), results)
    timed("join_agg_10x", lambda: join_agg(li10, o10), results)
    timed("topk_1x", lambda: topk(o1), results)
    timed("topk_10x", lambda: topk(o10), results)
    timed("window_topk_1x", lambda: window_topk(o1), results)
    timed("window_topk_10x", lambda: window_topk(o10), results)
    timed("minhash_1x", lambda: minhash(docs1), results)
    timed("minhash_10x", lambda: minhash(docs10), results)
    timed("jaccard_1x", lambda: jaccard(docs1), results)
    timed("jaccard_10x", lambda: jaccard(docs10_p), results)
    timed("clusters_1x", lambda: clusters(pairs1), results)
    timed("clusters_10x", lambda: clusters(pairs10), results)
    timed("emb_lsh_1x", lambda: emb_lsh(emb1), results)
    timed("emb_lsh_10x", lambda: emb_lsh(emb10, n_planes=9), results)
    timed("semantic_1x", lambda: semantic(emb1, k=8), results)
    timed("semantic_10x", lambda: semantic(emb10, k=80), results)
    # multiprobe scale path: 3 more planes (8x smaller buckets), recall
    # held by distance-1 probing — growth vs the same 1x base should be
    # flatter than the plain n_planes=9 row at comparable found pairs
    timed(
        "emb_lsh_mp_10x",
        lambda: emb_lsh(emb10, n_planes=12, probe_bits=1),
        results,
    )

    timed("pack_1x", lambda: pack(docs1), results)
    timed("pack_10x", lambda: pack(docs10), results)
    timed("contamination_1x", lambda: contamination(docs1), results)
    timed("contamination_10x", lambda: contamination(docs10), results)
    from littletable_spark.streaming import load_events
    from littletable_spark.streaming.events import epoch_seconds

    ev1 = load_events(spark, f"{SF_DIR}/events.parquet").df.select(
        "event_id", "user_id", "ts_sec"
    )
    ord1 = (
        o1.select(
            F.col("o_custkey").alias("user_id"),
            epoch_seconds(o1, "o_orderdate").alias("ot"),
            "o_orderkey",
        )
        .groupBy("user_id", "ot")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    ev10 = blow_up(ev1, ["event_id", "user_id"], COPIES).persist()
    ord10 = blow_up(ord1, ["user_id", "last_orderkey"], COPIES).persist()
    ev1 = ev1.persist(); ord1 = ord1.persist()
    ev1.count(), ord1.count(), ev10.count(), ord10.count()
    asof(ev1, ord1); asof(ev10, ord10)
    timed("asof_1x", lambda: asof(ev1, ord1), results)
    timed("asof_10x", lambda: asof(ev10, ord10), results)

    fquality(docs1); fquality(docs10); capgrp(docs1); capgrp(docs10)
    timed("fquality_1x", lambda: fquality(docs1), results)
    timed("fquality_10x", lambda: fquality(docs10), results)
    timed("capgrp_1x", lambda: capgrp(docs1), results)
    timed("capgrp_10x", lambda: capgrp(docs10), results)
    def spans(docs):
        from littletable_spark.operators.dedup import duplicate_spans

        duplicate_spans(Table.from_df(docs), "text", "doc_id", k=5)\
            .df.write.format("noop").mode("overwrite").save()

    def linededup(docs):
        from littletable_spark.operators.dedup import line_dedup

        line_dedup(Table.from_df(docs), "text", "doc_id")\
            .df.write.format("noop").mode("overwrite").save()

    # replica letter-rotation keeps dup grams/lines within-replica, so
    # span/line volume grows ~linearly — the plan property under test
    spans(docs1); spans(docs10); linededup(docs1); linededup(docs10)
    timed("dup_spans_1x", lambda: spans(docs1), results)
    timed("dup_spans_10x", lambda: spans(docs10), results)
    timed("line_dedup_1x", lambda: linededup(docs1), results)
    timed("line_dedup_10x", lambda: linededup(docs10), results)

    def logprob(docs):
        from littletable_spark.operators.textops import unigram_logprob

        unigram_logprob(Table.from_df(docs), "text", "doc_id", vocab_size=20)\
            .df.write.format("noop").mode("overwrite").save()

    def tfidf(docs):
        from littletable_spark.operators.textops import tfidf_top_terms

        tfidf_top_terms(Table.from_df(docs), "text", "doc_id", k=3)\
            .df.write.format("noop").mode("overwrite").save()

    logprob(docs1); logprob(docs10); tfidf(docs1); tfidf(docs10)
    timed("logprob_1x", lambda: logprob(docs1), results)
    timed("logprob_10x", lambda: logprob(docs10), results)
    timed("tfidf_1x", lambda: tfidf(docs1), results)
    timed("tfidf_10x", lambda: tfidf(docs10), results)

    # incremental ingestion shapes: a FIXED new batch against a 1x/10x
    # corpus — growth should be ~the corpus-side scan/aggregation, the
    # same asymmetry as contam_fixed
    newb = docs1.where(F.pmod(F.col("doc_id"), F.lit(17)) == 0).persist()
    newb.count()

    def minhash_incr(corpus):
        from littletable_spark.operators.dedup import minhash_lsh_pairs

        minhash_lsh_pairs(
            Table.from_df(newb), "doc_id", "text", against=Table.from_df(corpus)
        ).df.write.format("noop").mode("overwrite").save()

    def spans_incr(corpus):
        from littletable_spark.operators.dedup import duplicate_spans

        duplicate_spans(
            Table.from_df(newb), "text", "doc_id", k=5, min_docs=1,
            against=Table.from_df(corpus),
        ).df.write.format("noop").mode("overwrite").save()

    minhash_incr(docs1); minhash_incr(docs10)
    spans_incr(docs1); spans_incr(docs10)
    timed("minhash_incr_1x", lambda: minhash_incr(docs1), results)
    timed("minhash_incr_10x", lambda: minhash_incr(docs10), results)
    timed("spans_incr_1x", lambda: spans_incr(docs1), results)
    timed("spans_incr_10x", lambda: spans_incr(docs10), results)

    contamination_fixed_bench(docs1, docs1)
    contamination_fixed_bench(docs1, docs10)  # warm both shapes
    timed(
        "contam_fixed_1x", lambda: contamination_fixed_bench(docs1, docs1),
        results,
    )
    timed(
        "contam_fixed_10x", lambda: contamination_fixed_bench(docs1, docs10),
        results,
    )

    print(f"{'query':<18}{'1x sec':>9}{'10x sec':>10}{'ratio':>8}")
    for base in [
        "q1_agg", "join_agg", "topk", "window_topk", "minhash",
        "jaccard", "clusters", "emb_lsh", "semantic", "pack",
        "contamination",
        "contam_fixed", "fquality", "capgrp", "asof",
        "dup_spans", "line_dedup", "logprob", "tfidf",
        "minhash_incr", "spans_incr",
    ]:
        a, b = results[f"{base}_1x"], results[f"{base}_10x"]
        print(f"{base:<18}{a:>9.2f}{b:>10.2f}{b / a:>8.1f}x")
    a, b = results["emb_lsh_1x"], results["emb_lsh_mp_10x"]
    print(f"{'emb_lsh_mp':<18}{a:>9.2f}{b:>10.2f}{b / a:>8.1f}x")
    plain = emb_lsh_pairs_found(emb10, n_planes=9)
    mp = emb_lsh_pairs_found(emb10, n_planes=12, probe_bits=1)
    print(f"pairs found at 10x: planes=9 probe=0 -> {plain}; "
          f"planes=12 probe=1 -> {mp}")


if __name__ == "__main__":
    main()
