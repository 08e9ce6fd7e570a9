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
    """
    if not weights:
        raise ValueError("score_linear: weights is empty")
    missing = [c for c in weights if c not in table.fields]
    if missing:
        raise ValueError(
            f"score_linear: feature columns not in table: {missing}"
        )
    df = table._require_df()
    z = _logit_expr(weights, intercept)
    cols = [F.col(c) for c in df.columns] + [z.alias(out_col)]
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
    added columns, no UDF): Catalyst folds it into the scan stage."""
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
