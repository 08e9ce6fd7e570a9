"""Phase-split probe for q_text_bpe_pack (guide §1 measure-first).

Times the three phases of the BPE lifecycle separately, steady-state
(cached base tables, untimed warmup, median of N):
  train_collect  — the distributed word-count + collect
  merge_loop     — the driver-side _train_merges call
  apply_pack     — apply_bpe + join + pack_sequences against the noop sink

Usage: python scripts/bpe_phase_probe.py [--passes N] [--sf DIR]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)


def main() -> None:
    passes = 5
    sf_dir = SF_DIR
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            passes = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            i += 1

    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "1"
    import __spark_entry__ as entrymod
    from littletable_spark import get_spark
    from littletable_spark.operators import bpe as bpemod
    from littletable_spark.operators.bpe import apply_bpe, train_bpe
    from littletable_spark.operators.textops import pack_sequences
    from littletable_spark.table import Table
    from pyspark.sql import functions as F

    spark = get_spark(cpus=CPUS)

    def one_pass(record: dict | None) -> None:
        d = entrymod._t(spark, sf_dir, "documents")
        t0 = time.perf_counter()
        # --- train_collect (replicates train_bpe's distributed part)
        df = d._require_df()
        words = (
            df.select(
                F.explode(
                    F.regexp_extract_all(
                        F.col("text"), F.lit(bpemod.BPE_TOKEN_RE), F.lit(0)
                    )
                ).alias("word")
            )
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= F.lit(1))
            .orderBy(F.col("cnt").desc(), F.col("word").asc())
            .limit(5000)
        )
        pairs = [(r["word"], int(r["cnt"])) for r in words.collect()]
        t1 = time.perf_counter()
        merges_list = bpemod._train_merges(pairs, 60)
        t2 = time.perf_counter()
        # --- asset build + apply + pack (the rest of q_text_bpe_pack)
        alphabet = sorted({s for w, _ in pairs for s in bpemod._word_symbols(w)})
        from littletable_spark.session import small_df
        rows = [(i, l, r) for i, (l, r) in enumerate(merges_list)]
        rows += [(None, sym, None) for sym in alphabet]
        merges = Table.from_df(
            small_df(spark, rows, "rank int, left string, right string"),
            name="bpe_merges",
        )
        t3 = time.perf_counter()
        counts = apply_bpe(d, "text", "doc_id", merges)
        joined = d.join(counts, doc_id="doc_id")
        out = pack_sequences(
            joined, "text", "doc_id", budget_tokens=512, n_shards=8,
            salt="bpe", weight_col="n_bpe_tokens",
        )
        out.select("doc_id n_tokens shard pack pack_offset").df.write.format(
            "noop"
        ).mode("overwrite").save()
        t4 = time.perf_counter()
        if record is not None:
            record.setdefault("train_collect", []).append(t1 - t0)
            record.setdefault("merge_loop", []).append(t2 - t1)
            record.setdefault("asset_build", []).append(t3 - t2)
            record.setdefault("apply_pack", []).append(t4 - t3)

    one_pass(None)  # warmup
    rec: dict = {}
    for _ in range(passes):
        one_pass(rec)
    med = {k: round(sorted(v)[len(v) // 2], 3) for k, v in rec.items()}
    print(json.dumps({"phases_median": med, "passes": passes, "sf": sf_dir}))


if __name__ == "__main__":
    main()
