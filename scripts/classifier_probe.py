"""10x scale probe for the round-7 classifier surface.

Trains the hashed-text model ONCE on the 1x corpus (training is a
one-time cost by design), then times the two deployment paths —
score_text_classifier (explode -> native hash -> broadcast weight join
-> per-doc sum) and score_linear over quality_score features — against
a 1x and a 10x corpus. Both are scan-shaped with a broadcast-sized
model, so the expected growth is ~linear; anything superlinear means a
shuffle crept in.

Methodology matches scale_probe.py's pinned-input rule: the blown-up
corpus is persisted and counted before timing. Usage:
python scripts/classifier_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from littletable_spark import Table, get_spark
from littletable_spark.operators.classifier import (
    score_linear,
    score_text_classifier,
    train_text_classifier,
)
from littletable_spark.operators.textops import quality_score

SF_DIR = "/root/testdata/sf0.1"
COPIES = 10


def blow_up(df, copies):
    out = None
    for i in range(copies):
        part = df.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text"
        )
        out = part if out is None else out.unionByName(part)
    return out


def timed(label, fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.time()
        n = fn()
        times.append(time.time() - t0)
    times.sort()
    print(f"{label}: {times[1]:.3f}s (rows={n})")
    return times[1]


def main():
    spark = get_spark()
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    d1 = base.persist()
    n1 = d1.count()
    d10 = blow_up(base, COPIES).persist()
    n10 = d10.count()
    print(f"corpus 1x={n1} 10x={n10}")

    labeled = Table.from_df(
        d1.withColumn("label", (F.pmod("doc_id", F.lit(2))).cast("int"))
    )
    model = train_text_classifier(labeled, "text", "label", n_features=1 << 15)
    n_weights = len(model) - 1
    print(f"model: {n_weights} nonzero weights")

    t1 = Table.from_df(d1)
    t10 = Table.from_df(d10)

    def text_score(t):
        return lambda: score_text_classifier(
            t, model, "text", "doc_id", decision_col="keep"
        ).df.where("keep = 1").count()

    a = timed("text_score 1x", text_score(t1))
    b = timed("text_score 10x", text_score(t10))
    print(f"text_score growth: {b / a:.2f}x for {COPIES}x data")

    W = {"n_tokens": 0.02, "punct_ratio": -12.0, "stopword_ratio": 3.0}

    def lin_score(t):
        return lambda: score_linear(
            quality_score(t, "text", "doc_id"), W, -1.0, decision_col="keep"
        ).df.where("keep = 1").count()

    c = timed("linear_score 1x", lin_score(t1))
    d = timed("linear_score 10x", lin_score(t10))
    print(f"linear_score growth: {d / c:.2f}x for {COPIES}x data")


if __name__ == "__main__":
    main()
