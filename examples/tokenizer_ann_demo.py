"""Tokenizer + ANN capabilities end-to-end: BPE tokenizer asset,
real-token budgeting, training-ready token ids, and compressed ANN
indexes.

1. Train a BPE tokenizer over the corpus (one word-count shuffle +
   driver merge loop) and persist the merges table.
2. Tokenize, chunk in REAL tokens, pack into fixed token budgets.
3. Round 9: byte-level mode (zero unks on any input), stable token
   ids, packed id arrays, and detokenization back to text.
4. Build a product-quantized IVF index over the embeddings (m-byte
   codes instead of vectors), persist it, and search it with exact
   re-rank; float32 storage for the uncompressed variant.

Run: python examples/tokenizer_ann_demo.py [sf_dir]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from littletable_spark import Table, get_spark
from littletable_spark.operators.bpe import apply_bpe, chunk_by_pieces, train_bpe
from littletable_spark.operators.similarity import ivf_index_table, ivf_topk
from littletable_spark.operators.textops import pack_sequences


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(cpus=8)
    root = tempfile.mkdtemp(prefix="lts_demo_")
    docs = Table.parquet_import(spark, f"{sf_dir}/documents.parquet", "documents")

    # 1. tokenizer as a durable asset
    merges = train_bpe(docs, "text", num_merges=200, max_words=20_000)
    merges.parquet_export(f"{root}/bpe_merges.parquet")
    merges = Table.parquet_import(spark, f"{root}/bpe_merges.parquet", "merges")
    print(f"trained {len(merges)} merges")

    # 2. real-token budgeting: counts -> packing, pieces -> chunking
    counts = apply_bpe(docs, "text", "doc_id", merges)
    packed = pack_sequences(
        docs.join(counts, doc_id="doc_id"), "text", "doc_id",
        budget_tokens=512, n_shards=8, weight_col="n_bpe_tokens",
    )
    print("packs:", packed.df.select("shard", "pack").distinct().count())
    pieces = apply_bpe(docs, "text", "doc_id", merges, emit_pieces=True)
    chunks = chunk_by_pieces(pieces, "pieces", "doc_id", chunk_tokens=128)
    print("chunks:", len(chunks))

    # 3. round-9 token-id surface: byte-level asset (no unk ever),
    # stable ids, packed id arrays, and back to text
    from littletable_spark.operators.bpe import (
        bpe_vocab,
        detokenize_bpe,
        pack_token_ids,
    )

    bl_merges = train_bpe(
        docs, "text", num_merges=200, max_words=20_000, byte_level=True
    )
    vocab = bpe_vocab(bl_merges)
    print(f"byte-level vocab: {len(vocab)} pieces (full byte coverage)")
    ids = apply_bpe(docs, "text", "doc_id", bl_merges, emit_ids=True)
    with_coords = packed.select("doc_id shard pack").join(
        ids.select("doc_id token_ids"), doc_id="doc_id"
    )
    pack_ids = pack_token_ids(with_coords, "doc_id")
    print("packed id sequences:", len(pack_ids))
    round_trip = detokenize_bpe(ids, "token_ids", "doc_id", bl_merges)
    n_exact = round_trip.join(
        docs.select("doc_id text").compute_field(
            "orig", lambda r: r.text
        ).select("doc_id orig"),
        doc_id="doc_id",
    ).where(lambda r: r.text == r.orig)
    print(f"detokenize round-trip exact: {len(n_exact)}/{len(docs)}")

    # 4. PQ ANN index: built once, stored, searched with exact re-rank
    emb = Table.parquet_import(spark, f"{sf_dir}/embeddings.parquet", "embeddings")
    idx = ivf_index_table(emb, "vec_id", "embedding", nlist=16, pq_m=8)
    idx.df.write.mode("overwrite").parquet(f"{root}/pq_index")
    stored = Table.parquet_import(spark, f"{root}/pq_index", "pq_index")
    queries = Table.from_df(emb.df.where("vec_id < 3"), name="queries")
    hits = ivf_topk(
        emb, queries, "vec_id", "embedding", k=5, nprobe=4,
        against_index=stored, rerank=50,
    )
    hits.orderby("query_id, rank")
    print(hits.as_markdown())


if __name__ == "__main__":
    main()
