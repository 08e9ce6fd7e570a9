"""Model-based quality filtering: linear/logistic document scoring.

The curation stacks behind modern LLM corpora pair heuristic rules
(``filter_quality``'s Gopher-style gates) with a LEARNED quality model
— a small linear classifier over cheap document features, scored over
the whole corpus and thresholded (the fastText / DCLM-style pipeline
stage). This module supplies that stage Spark-first:

- ``score_linear`` evaluates a weights dict as one narrow JVM
  projection — a fixed-order dot product in whole-stage codegen, no
  UDF, no shuffle, engine-portable arithmetic (same-order double sums
  are bit-identical across engines, so the logit is oracle-checkable).
- ``train_quality_classifier`` fits the weights with pyspark.ml's
  distributed LogisticRegression (LBFGS over an assembled feature
  vector; the model is n_features doubles) and hands back a PLAIN
  ``{"weights": {...}, "intercept": ...}`` dict — no pipeline object
  to serialize, nothing proprietary, directly consumable by
  ``score_linear`` or by the SQL twin of any oracle.
- ``filter_by_classifier`` applies the threshold as a pure Column
  predicate, so Catalyst pushes what it can toward the scan.

Scale shape (100 TB): scoring is embarrassingly parallel scan work —
features are projections, the logit is a codegen'd expression, and the
filter prunes before anything downstream; training reduces gradient
aggregates tree-wise per LBFGS iteration and broadcasts a model of
n_features doubles. Neither stage collects rows to the driver.

No reference analog (SURVEY.md §2 has no ML surface); net-new
LLM-pipeline capability alongside textops.quality_score (whose
feature columns are this module's natural input).
"""
from __future__ import annotations

import math
from typing import Any

from pyspark.sql import Column, functions as F

from ..session import small_df
from ..table import Table


def _logit_expr(weights: dict[str, float], intercept: float) -> Column:
    """intercept + Σ w·col, summed in sorted-feature order: a FIXED
    association so Spark and any SQL oracle add the same doubles in
    the same order (IEEE addition is order-sensitive in the last ulp,
    and near-threshold decisions must not flip across engines)."""
    z: Column = F.lit(float(intercept))
    for name in sorted(weights):
        z = z + F.lit(float(weights[name])) * F.col(name).cast("double")
    return z


def score_linear(
    table: Table,
    weights: dict[str, float],
    intercept: float = 0.0,
    out_col: str = "logit",
    prob_col: str | None = None,
    decision_col: str | None = None,
    threshold: float = 0.0,
) -> Table:
    """Score every row with a linear model over feature COLUMNS:
    ``out_col`` = intercept + Σ weights[c]·c (the raw logit).

    ``prob_col`` adds the sigmoid 1/(1+e^-z). Keep probabilities out
    of hash-checked oracles — ``exp`` may differ in the last ulp
    across engines; the logit (fixed-order multiply-add) and any
    threshold decision on it are the portable surface, and the
    sigmoid is monotone so thresholding the logit IS thresholding the
    probability. ``decision_col`` adds ``logit > threshold`` as an
    int (1 = keep).

    NULL features: a NULL in any feature column propagates to a NULL
    logit/prob/decision for that row (SQL three-valued arithmetic) —
    mirroring how ``train_quality_classifier`` dropna()s such rows at
    fit time. Rows unseen at train time are therefore visibly NULL
    here, not silently scored; coalesce features upstream (e.g.
    ``compute_field(..., default=0)``) if a 0-imputed score is wanted.
    """
    if not weights:
        raise ValueError("score_linear: weights is empty")
    missing = [c for c in weights if c not in table.fields]
    if missing:
        raise ValueError(
            f"score_linear: feature columns not in table: {missing}"
        )
    taken = [
        c
        for c in (out_col, prob_col, decision_col)
        if c is not None and c in table.fields
    ]
    if taken:
        raise ValueError(
            f"score_linear: output columns already exist: {taken} — "
            "a silent duplicate would break downstream name resolution"
        )
    df = table._require_df()
    z = _logit_expr(weights, intercept)
    cols = list(df.columns) + [z.alias(out_col)]
    if prob_col is not None:
        cols.append(
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias(prob_col)
        )
    if decision_col is not None:
        cols.append(
            (z > F.lit(float(threshold))).cast("int").alias(decision_col)
        )
    return Table.from_df(df.select(*cols), name=f"{table.table_name}_scored")


def filter_by_classifier(
    table: Table,
    weights: dict[str, float],
    intercept: float = 0.0,
    threshold: float = 0.0,
) -> Table:
    """Keep rows whose logit clears the threshold — the corpus-filter
    deployment of a trained quality model. Pure Column predicate (no
    added columns, no UDF): Catalyst folds it into the scan stage.

    NULL features: a NULL in any feature column makes the predicate
    NULL, and SQL filters DROP null-predicate rows — so rows the
    training path would have dropna()'d are excluded here too, by the
    same rule. If corpus-filtering loss must be audited, run
    ``score_linear(..., decision_col=...)`` first and count the NULL
    decisions before filtering.
    """
    if not weights:
        raise ValueError("filter_by_classifier: weights is empty")
    missing = [c for c in weights if c not in table.fields]
    if missing:
        raise ValueError(
            f"filter_by_classifier: feature columns not in table: {missing}"
        )
    df = table._require_df()
    pred = _logit_expr(weights, intercept) > F.lit(float(threshold))
    return Table.from_df(df.where(pred), name=f"{table.table_name}_kept")


def train_quality_classifier(
    table: Table,
    feature_cols: list[str],
    label_col: str,
    max_iter: int = 100,
    reg_param: float = 0.0,
    elastic_net_param: float = 0.0,
    standardize: bool = True,
) -> dict[str, Any]:
    """Fit a logistic-regression quality model on labeled documents
    (label 1 = high quality) and return a plain, portable
    ``{"weights": {col: w}, "intercept": b}`` — the exact input
    ``score_linear`` / ``filter_by_classifier`` take, with the
    standardization folded INTO the returned weights so scoring needs
    no scaler object.

    Distributed: pyspark.ml's LBFGS aggregates gradients tree-wise per
    iteration; nothing but the (n_features)-double model reaches the
    driver. Rows with a NULL in any feature or the label are dropped
    (documented, counted in the result) rather than silently poisoning
    the fit.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    if not feature_cols:
        raise ValueError("train_quality_classifier: feature_cols is empty")
    missing = [c for c in [*feature_cols, label_col] if c not in table.fields]
    if missing:
        raise ValueError(
            f"train_quality_classifier: columns not in table: {missing}"
        )
    df = table._require_df().select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__label__"),
    )
    clean = df.dropna()
    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="__features__"
    ).transform(clean)
    lr = LogisticRegression(
        featuresCol="__features__",
        labelCol="__label__",
        maxIter=max_iter,
        regParam=reg_param,
        elasticNetParam=elastic_net_param,
        standardization=standardize,
        family="binomial",
    )
    model = lr.fit(assembled)
    coefs = model.coefficients.toArray()
    weights = {c: float(w) for c, w in zip(feature_cols, coefs)}
    summary = model.summary
    return {
        "weights": weights,
        "intercept": float(model.intercept),
        "n_rows": clean.count(),
        "train_accuracy": float(summary.accuracy),
        "train_auc": float(summary.areaUnderROC),
    }


def sigmoid(z: float) -> float:
    """Driver-side convenience mirroring ``prob_col``'s arithmetic."""
    return 1.0 / (1.0 + math.exp(-z))


def _hash_idx(tok: Column, n_features: int) -> Column:
    """Feature index of a token: pmod(murmur3(token), n) — the hashing
    trick as a native JVM expression. Deliberately NOT spark.ml's
    HashingTF.indexOf, whose murmur3 variant differs from
    ``F.hash`` (verified empirically): train and score must share ONE
    index function, and this one exists on the pure-DataFrame side
    where the 100 TB scoring scan lives."""
    return F.pmod(F.hash(tok), F.lit(n_features)).cast("int")


def train_text_classifier(
    table: Table,
    text_col: str,
    label_col: str,
    n_features: int = 1 << 15,
    max_iter: int = 100,
    reg_param: float = 1e-4,
) -> Table:
    """Fit a fastText-style hashed bag-of-words quality classifier on
    raw text and return the model AS A TABLE — one row per nonzero
    coefficient ``(feature_idx, weight)`` plus a NULL-idx scalar row
    carrying the intercept and ``n_features`` (the same
    self-describing one-table layout as ``term_stats_table`` /
    ``ivf_index_table``), so the model parquet-exports like any other
    durable asset and ``score_text_classifier`` needs nothing else.

    Features are token counts under the hashing trick: index =
    pmod(murmur3(token), n_features), counted per document — unseen
    future tokens still land in trained buckets, and the model size is
    capped at ``n_features`` regardless of vocabulary. The fit is
    pyspark.ml's distributed LogisticRegression (L2 by default — keeps
    every bucket usable at score time).

    The per-document sparse vectors are assembled through a
    row-at-a-time UDF — the ONE place this module leaves codegen,
    confined to the one-time model fit (VectorUDT is the ml API
    boundary; Arrow does not carry it). Scoring never pays it: see
    ``score_text_classifier``.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors, VectorUDT

    from .textops import _tokens

    if n_features <= 0:
        raise ValueError("n_features must be positive")
    missing = [c for c in (text_col, label_col) if c not in table.fields]
    if missing:
        raise ValueError(
            f"train_text_classifier: columns not in table: {missing}"
        )
    df = table._require_df()
    # NULL-label / NULL-text rows are dropped (mirroring
    # train_quality_classifier's dropna), not fed to the fit — a single
    # NULL label would otherwise surface as an opaque JVM error; note
    # token-LESS documents also contribute nothing to a bag-of-words
    # fit and are likewise absent from the assembled training set
    clean = df.where(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    )
    toks = clean.select(
        F.monotonically_increasing_id().alias("__doc__"),
        F.col(label_col).cast("double").alias("__label__"),
        F.explode(_tokens(text_col)).alias("__tok__"),
    )
    counts = (
        toks.withColumn("__idx__", _hash_idx(F.col("__tok__"), n_features))
        .groupBy("__doc__", "__label__", "__idx__")
        .agg(F.count(F.lit(1)).cast("double").alias("__cnt__"))
        .groupBy("__doc__", "__label__")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__idx__", "__cnt__"))
            ).alias("__pairs__")
        )
    )

    @F.udf(returnType=VectorUDT())
    def to_vec(pairs):
        return Vectors.sparse(
            n_features, [int(p["__idx__"]) for p in pairs],
            [float(p["__cnt__"]) for p in pairs],
        )

    assembled = counts.select(
        F.col("__label__"), to_vec("__pairs__").alias("__features__")
    )
    lr = LogisticRegression(
        featuresCol="__features__",
        labelCol="__label__",
        maxIter=max_iter,
        regParam=reg_param,
        family="binomial",
    )
    model = lr.fit(assembled)
    coefs = model.coefficients
    spark = table.spark
    weight_rows = [
        (int(i), float(w), None)
        for i, w in zip(coefs.indices, coefs.values)
    ] if hasattr(coefs, "indices") else [
        (int(i), float(w), None) for i, w in enumerate(coefs.toArray()) if w
    ]
    schema = "feature_idx int, weight double, n_features int"
    wdf = small_df(spark, weight_rows, schema)
    scalar = small_df(
        spark, [(None, float(model.intercept), int(n_features))], schema
    )
    return Table.from_df(
        wdf.unionByName(scalar), name=f"{table.table_name}_text_clf"
    )


def score_text_classifier(
    table: Table,
    model: Table,
    text_col: str,
    id_col: str,
    out_col: str = "logit",
    decision_col: str | None = None,
    threshold: float = 0.0,
) -> Table:
    """Score raw text with a ``train_text_classifier`` model — the
    100 TB deployment path, entirely JVM-side: explode tokens, compute
    the hashed index natively, broadcast-join the (≤ n_features)-row
    weight table, and sum per document. logit = intercept +
    Σ_occurrences weight[idx(token)] — exactly the linear margin the
    fit optimized (token counts × weights, occurrence by occurrence).
    No UDF, no vector types, no driver collect of anything but the
    one intercept row; documents whose tokens all miss trained buckets
    score the bare intercept (LEFT join + zero-fill).
    """
    from .textops import _tokens

    for c in ("feature_idx", "weight", "n_features"):
        if c not in model.fields:
            raise ValueError(
                "score_text_classifier: model must be a "
                f"train_text_classifier table (missing {c!r})"
            )
    taken = [
        c
        for c in (out_col, decision_col)
        if c is not None and c in table.fields
    ]
    if taken:
        raise ValueError(
            f"score_text_classifier: output columns already exist: {taken}"
        )
    scalar = (
        model.df.where(F.col("feature_idx").isNull())
        .select("weight", "n_features")
        .collect()
    )
    if len(scalar) != 1:
        raise ValueError(
            f"model has {len(scalar)} intercept rows (feature_idx IS "
            "NULL); exactly one expected"
        )
    intercept = float(scalar[0]["weight"])
    n_features = int(scalar[0]["n_features"])

    df = table._require_df()
    toks = df.select(
        F.col(id_col).alias("__id__"),
        F.explode_outer(_tokens(text_col)).alias("__tok__"),
    ).withColumn(
        "__idx__",
        # explode_outer keeps token-less documents as one NULL-token
        # row (so they still score the intercept) — but murmur3(NULL)
        # is the seed, not NULL, and would spuriously join bucket 42
        F.when(
            F.col("__tok__").isNotNull(),
            _hash_idx(F.col("__tok__"), n_features),
        ),
    )
    weights = model.df.where(F.col("feature_idx").isNotNull()).select(
        F.col("feature_idx").alias("__idx__"), F.col("weight")
    )
    per_doc = (
        toks.join(F.broadcast(weights), on="__idx__", how="left")
        .groupBy("__id__")
        .agg(
            (
                F.lit(intercept)
                + F.coalesce(F.sum("weight"), F.lit(0.0))
            ).alias(out_col)
        )
    )
    out = df.join(
        per_doc.withColumnRenamed("__id__", id_col), on=id_col, how="left"
    )
    if decision_col is not None:
        out = out.withColumn(
            decision_col,
            (F.col(out_col) > F.lit(float(threshold))).cast("int"),
        )
    return Table.from_df(out, name=f"{table.table_name}_text_scored")
