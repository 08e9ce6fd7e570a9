"""Scale probe for the BPE tokenizer: train and apply cost as the
corpus grows 10x.

Claims probed:
1. TRAIN — one corpus word-count shuffle + a driver merge loop over the
   BOUNDED top-max_words dict: the driver part is corpus-size-
   independent, so train time grows sublinearly (the shuffle's combine
   output is vocabulary-bounded).
2. APPLY — broadcast ranks + per-batch word cache: throughput is linear
   in corpus tokens with no shuffle (pure mapInPandas scan).

Methodology mirrors ingest_probe.py: inputs persisted + counted before
timing, median of 3 after a warm pass. Usage: python scripts/bpe_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from littletable_spark import Table, get_spark

SF_DIR = "/root/testdata/sf0.1"
COPIES = 10


def _median3(fn) -> float:
    fn()  # warm pass
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def main() -> None:
    from littletable_spark.operators.bpe import apply_bpe, train_bpe

    spark = get_spark(cpus=32)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = None
    for i in range(COPIES):
        c = base.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"), "text"
        )
        big = c if big is None else big.unionByName(c)
    d1 = Table.from_df(base.persist(), name="d1")
    d10 = Table.from_df(big.persist(), name="d10")
    n1, n10 = d1.df.count(), d10.df.count()

    out = {}
    for tag, corpus, n in (("1x", d1, n1), ("10x", d10, n10)):
        t_train = _median3(
            lambda c=corpus: train_bpe(c, "text", num_merges=200, max_words=50_000)
        )
        merges = train_bpe(corpus, "text", num_merges=200, max_words=50_000)

        def run_apply(c=corpus, m=merges):
            apply_bpe(c, "text", "doc_id", m).df.write.format("noop").mode(
                "overwrite"
            ).save()

        t_apply = _median3(run_apply)
        out[tag] = {"docs": n, "train_sec": round(t_train, 3), "apply_sec": round(t_apply, 3)}
        print(tag, out[tag], flush=True)

    r1, r10 = out["1x"], out["10x"]
    print(
        "SUMMARY:",
        f"train 1x->10x {r1['train_sec']}s -> {r10['train_sec']}s"
        f" ({round(r10['train_sec'] / max(r1['train_sec'], 1e-9), 2)}x, sublinear expected);",
        f"apply 1x->10x {r1['apply_sec']}s -> {r10['apply_sec']}s"
        f" ({round(r10['apply_sec'] / max(r1['apply_sec'], 1e-9), 2)}x, ~linear expected)",
        flush=True,
    )


if __name__ == "__main__":
    main()
