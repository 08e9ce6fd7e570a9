"""Scale probe for the product-quantized IVF index: storage and search
cost as the corpus behind the index grows 10x.

Claims probed:
1. STORAGE — the per-vector assignment rows shrink >=8x vs the plain
   full-vector index (measured as written parquet bytes of the
   corpus-growing rows; the model rows are O(nlist + m*ksub) constants).
2. SEARCH — ADC candidate generation reads m-byte codes, so the probed
   scan's byte volume (and at fixed nprobe/nlist its time) scales with
   CODE bytes, not vector bytes; the exact re-rank touches only
   rerank x queries corpus rows regardless of corpus size.

Methodology mirrors ingest_probe.py: inputs persisted + counted before
timing, median of 3 after a warm pass. Usage: python scripts/pq_probe.py
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
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


def _dir_bytes(d: str) -> int:
    return sum(os.path.getsize(f) for f in glob.glob(f"{d}/**/*.parquet", recursive=True))


def main() -> None:
    from littletable_spark.operators.similarity import ivf_index_table, ivf_topk

    spark = get_spark(cpus=32)
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    big = None
    for i in range(COPIES):
        c = base.select(
            (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
            "embedding",
        )
        big = c if big is None else big.unionByName(c)
    e1 = Table.from_df(base.persist(), name="e1")
    e10 = Table.from_df(big.persist(), name="e10")
    n1, n10 = e1.df.count(), e10.df.count()
    q = Table.from_df(e1.df.where("vec_id < 5"), name="q")

    root = tempfile.mkdtemp(prefix="pq_probe_")
    out = {}
    for tag, corpus, n in (("1x", e1, n1), ("10x", e10, n10)):
        plain = ivf_index_table(corpus, "vec_id", "embedding", nlist=16, seed=42)
        pq = ivf_index_table(
            corpus, "vec_id", "embedding", nlist=16, pq_m=8, seed=42
        )
        rowsel = F.col("corpus_id").isNotNull()
        p_plain, p_pq = f"{root}/plain_{tag}", f"{root}/pq_{tag}"
        plain.df.where(rowsel).drop("centroid").write.parquet(p_plain)
        pq.df.where(rowsel).select("cluster", "corpus_id", "codes").write.parquet(p_pq)
        b_plain, b_pq = _dir_bytes(p_plain), _dir_bytes(p_pq)

        # stored-index search timing (full pipeline incl. re-rank)
        plain.df.write.parquet(f"{root}/sidx_plain_{tag}")
        pq.df.write.parquet(f"{root}/sidx_pq_{tag}")
        s_plain = Table.parquet_import(spark, f"{root}/sidx_plain_{tag}")
        s_pq = Table.parquet_import(spark, f"{root}/sidx_pq_{tag}")

        def run_plain():
            ivf_topk(
                corpus, q, "vec_id", "embedding", k=10, nprobe=4,
                against_index=s_plain,
            ).df.write.format("noop").mode("overwrite").save()

        def run_pq():
            ivf_topk(
                corpus, q, "vec_id", "embedding", k=10, nprobe=4,
                against_index=s_pq, rerank=80,
            ).df.write.format("noop").mode("overwrite").save()

        out[tag] = {
            "rows": n,
            "bytes_plain": b_plain,
            "bytes_pq": b_pq,
            "bytes_ratio": round(b_plain / b_pq, 2),
            "search_plain_sec": round(_median3(run_plain), 3),
            "search_pq_sec": round(_median3(run_pq), 3),
        }
        print(tag, out[tag], flush=True)

    r1, r10 = out["1x"], out["10x"]
    print(
        "SUMMARY:",
        f"assignment bytes {r1['bytes_ratio']}x / {r10['bytes_ratio']}x smaller (1x/10x);",
        f"pq search 1x->10x: {r1['search_pq_sec']}s -> {r10['search_pq_sec']}s"
        f" ({round(r10['search_pq_sec'] / max(r1['search_pq_sec'], 1e-9), 2)}x),",
        f"plain search 1x->10x: {r1['search_plain_sec']}s -> {r10['search_plain_sec']}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
