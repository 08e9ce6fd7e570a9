"""A training-data curation pipeline over the documents/embeddings tables:
quality-filter -> language ID -> exact + near dedup -> similarity check.

Run: python examples/corpus_pipeline_demo.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from littletable_spark import Table, get_spark
from littletable_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from littletable_spark.operators.similarity import cosine_topk
from littletable_spark.operators.textops import lang_id, quality_score


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(cpus=8)
    docs = Table.parquet_import(spark, f"{sf_dir}/documents.parquet", "documents")

    # 1. quality gate
    q = quality_score(docs, "text", "doc_id")
    keep = q.where(quality=Table.ge(0.3))
    print(f"quality gate: {len(keep)}/{len(docs)} docs pass")

    # 1b. rule-based filtering with an audit trail: which Gopher rule
    # rejects how many docs (explainable curation)
    from littletable_spark.operators.textops import filter_quality

    fq = filter_quality(docs, "text", "doc_id")
    rej = Table.from_df(
        fq.df.select(F.explode("failed_rules").alias("rule"))
        .groupBy("rule")
        .count()
    )
    print(f"gopher rules: {len(fq.where(keep=True))}/{len(fq)} docs keep; "
          "rejections by rule:")
    rej.orderby("count desc").present()

    # 1c. per-source quota so no domain dominates the mix
    from littletable_spark.operators.sampling import cap_per_group

    capped = cap_per_group(docs, "source", 10, key_col="doc_id", salt="demo")
    print(f"per-source cap (10): {len(capped)}/{len(docs)} docs survive")

    # 1d. LM-quality proxy: mean token log-prob under the corpus's own
    # unigram model — low scorers are gibberish/boilerplate candidates
    from littletable_spark.operators.textops import unigram_logprob

    lp = unigram_logprob(docs, "text", "doc_id", vocab_size=1000)
    worst = lp.orderby("logprob_per_token").head(3)
    print("lowest LM-quality docs:",
          [r.doc_id for r in worst])

    # 2. language distribution (predicted)
    langs = lang_id(docs, "text", "doc_id")
    langs.groupby_with_summaries("pred_lang", n=F.count(F.lit(1))).orderby(
        "n desc"
    ).present()

    # 3. dedup: exact, then MinHash candidates verified by Jaccard
    exact = exact_dedup(docs, ["text"], "doc_id")
    print(f"exact dedup: {len(docs) - len(exact)} duplicate docs removed")
    cands = minhash_lsh_pairs(docs, "doc_id", "text")
    verified = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.7)
    print(f"near-dup: {len(cands)} LSH candidates, {len(verified)} verified ≥0.7")

    # 3b. exact-substring spans: cut cross-document duplicated runs out
    # of the surviving text, and strip boilerplate lines
    from littletable_spark.operators.dedup import (
        duplicate_spans,
        line_dedup,
        remove_duplicate_spans,
    )

    spans = duplicate_spans(docs, "text", "doc_id", k=8)
    cleaned = remove_duplicate_spans(docs, "text", "doc_id", k=8)
    deboiler = line_dedup(docs, "text", "doc_id")
    print(f"exact-substring: {len(spans)} duplicate spans cut "
          f"({len(cleaned)} docs rewritten); line dedup keeps "
          f"{len(deboiler)}/{len(docs)} docs")

    # 3c. incremental ingestion: dedupe a "new batch" against the
    # existing corpus without any corpus x corpus work
    new_batch = Table.from_df(
        docs.df.where(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    )
    old_corpus = Table.from_df(
        docs.df.where(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    )
    incr = minhash_lsh_pairs(new_batch, "doc_id", "text", against=old_corpus)
    incr_spans = duplicate_spans(
        new_batch, "text", "doc_id", k=8, min_docs=1, against=old_corpus
    )
    print(f"incremental: {len(incr)} new-vs-corpus near-dup candidates, "
          f"{len(incr_spans)} exact spans already present in the corpus")

    # 4. nearest neighbors for the first few embeddings
    emb = Table.parquet_import(spark, f"{sf_dir}/embeddings.parquet", "embeddings")
    nn = cosine_topk(emb, emb.where(vec_id=Table.lt(3)), "vec_id", "embedding", k=3)
    print("\nTop-3 neighbors per query vector:")
    nn.orderby("query_id, rank").select("query_id corpus_id cosine rank").present()

    # 4b. SemDeDup: k-means blocks the embedding space, exact cosine
    # only within each cluster (never the O(N²) all-pairs)
    from littletable_spark.operators.dedup import semantic_dedup
    from littletable_spark.operators.similarity import cluster_embeddings

    cl = cluster_embeddings(emb, "vec_id", "embedding", k=4, train_iters=5)
    sem = semantic_dedup(emb, "vec_id", "embedding", threshold=0.3, clusters=cl)
    print(f"semantic dedup: {len(emb)} vectors -> {len(sem)} survivors "
          f"(within-cluster cosine >= 0.3, 4 clusters)")

    # 5. chunk + pack into training-ready context windows
    from littletable_spark.operators.textops import chunk_documents, pack_sequences

    chunks = chunk_documents(docs, "text", "doc_id", chunk_tokens=64, overlap=8)
    packs = pack_sequences(docs, "text", "doc_id", budget_tokens=512, n_shards=4)
    n_packs = packs.df.select("shard", "pack").distinct().count()
    print(f"\nchunking: {len(chunks)} chunks; packing: {len(docs)} docs -> "
          f"{n_packs} packs of ~512 tokens")


if __name__ == "__main__":
    main()
