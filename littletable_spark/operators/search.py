"""Full-text search: inverted index + query DSL.

Capability parity with the reference's search engine
(littletable.py:1701-1942 build/maintenance, 1781-1917 query DSL,
637-681 accessor): per-attribute inverted index, stopword/plural/acronym
normalization (functions/normalize.py), and the ``++ -- + -`` query
grammar with +1000/-1000/+100 weights and required/excluded handling.

Spark-first design:
- the index is a derived DataFrame ``(row_ord, epoch, word)`` built with
  an Arrow-batched pandas UDF + ``explode`` — embarrassingly parallel,
  persisted for repeated queries;
- a query builds a tiny (term, weight) DataFrame, broadcast-joins it
  against the index, and aggregates scores per row — one shuffle on
  row_ord, no driver-side scan;
- required terms are enforced with a per-term distinct-count condition,
  excluded terms with a broadcast anti-join;
- staleness is a version stamp checked against the table's mutation
  counter (reference ``SearchIndexInconsistentError``).
"""

from __future__ import annotations

import shlex
from types import SimpleNamespace
from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as SQLT

from ..functions.normalize import normalize_query_term, normalize_text
from ..plans.ordering import ROW_ORD

BARE_WEIGHT = 100
PREFER_WEIGHT = 1000
NONPREFER_WEIGHT = -1000


class SearchIndex:
    def __init__(self, attr: str, index_df: DataFrame, version: int) -> None:
        self.attr = attr
        self.index_df = index_df
        self.version = version
        self.normalize = True

    @classmethod
    def build(
        cls,
        table,
        attr: str,
        stopwords: Iterable[str] | None = None,
        normalize: bool = True,
    ) -> "SearchIndex":
        from ..table import EPOCH

        extra_stop = frozenset(stopwords or ())
        text = F.col(attr).cast("string")
        if normalize:

            @F.pandas_udf(SQLT.ArrayType(SQLT.StringType()))
            def terms_of(texts: pd.Series) -> pd.Series:
                return texts.map(
                    lambda t: [
                        w for w in normalize_text(t or "") if w not in extra_stop
                    ]
                )

            words = terms_of(text)
        else:
            # raw mode: lowercase whitespace tokens, no linguistic
            # normalization — fully native (and SQL-reproducible)
            toks = F.filter(
                F.split(F.trim(F.lower(text)), r"\s+"), lambda x: x != F.lit("")
            )
            if extra_stop:
                stop_arr = F.array(*[F.lit(s) for s in sorted(extra_stop)])
                toks = F.filter(toks, lambda x: ~F.array_contains(stop_arr, x))
            words = F.array_distinct(toks)

        # key rows by (epoch, row_ord): row_ord alone is only unique
        # within one insert batch
        df = table._require_df().select(
            F.col(EPOCH),
            F.col(ROW_ORD),
            F.explode(words).alias("word"),
        )
        index_df = df.persist()
        idx = cls(attr, index_df, table._version)
        idx.normalize = normalize
        return idx

    def unpersist(self) -> None:
        try:
            self.index_df.unpersist()
        except Exception:
            pass


def parse_query(query: str) -> list[tuple[str, str]]:
    """Split a query into (mode, term): mode in {required, excluded,
    prefer, nonprefer, bare}. Quoting via shlex (littletable.py:1810)."""
    out: list[tuple[str, str]] = []
    for raw in shlex.split(query):
        if raw.startswith("++"):
            out.append(("required", raw[2:]))
        elif raw.startswith("--"):
            out.append(("excluded", raw[2:]))
        elif raw.startswith("+"):
            out.append(("prefer", raw[1:]))
        elif raw.startswith("-"):
            out.append(("nonprefer", raw[1:]))
        else:
            out.append(("bare", raw))
    return [(m, t) for m, t in out if t]


class SearchAccessor:
    """``table.search.<attr>(query, ...)`` (littletable.py:637-681)."""

    def __init__(self, table) -> None:
        self._table = table

    def __getattr__(self, attr: str):
        if attr.startswith("_"):
            raise AttributeError(attr)
        table = self._table

        def run(
            query: str,
            limit: int | None = None,
            min_score: int | None = None,
            include_words: bool = False,
            as_table: bool = True,
        ):
            return search(table, attr, query, limit, min_score, include_words, as_table)

        return run


def search(
    table,
    attr: str,
    query: str,
    limit: int | None = None,
    min_score: int | None = None,
    include_words: bool = False,
    as_table: bool = True,
):
    idx: SearchIndex = table._get_search_index(attr)
    spark = table.spark
    parsed = parse_query(query)

    # expand each term into its normalized variants, one scoring row each
    term_rows: list[dict] = []
    n_required = 0
    for term_id, (mode, term) in enumerate(parsed):
        if idx.normalize:
            variants = normalize_query_term(term)
        else:
            variants = [term.lower()] if term.strip() else []
        if not variants:
            continue
        if mode == "required":
            n_required += 1
            weight = BARE_WEIGHT
        elif mode == "prefer":
            weight = PREFER_WEIGHT
        elif mode == "nonprefer":
            weight = NONPREFER_WEIGHT
        elif mode == "excluded":
            weight = 0
        else:
            weight = BARE_WEIGHT
        for v in variants:
            term_rows.append(
                {"word": v, "term_id": term_id, "mode": mode, "weight": weight}
            )
    if not term_rows:
        empty = table._require_df().limit(0)
        return table._derive(empty) if as_table else []

    terms_df = F.broadcast(
        spark.createDataFrame(term_rows, schema="word string, term_id long, mode string, weight long")
    )
    joined = idx.index_df.join(terms_df, on="word")

    from ..table import EPOCH

    # one contribution per (row, query-term): a term matching several of a
    # row's words still scores once
    per_term = joined.groupBy(EPOCH, ROW_ORD, "term_id").agg(
        F.first("mode").alias("mode"),
        F.first("weight").alias("weight"),
        F.collect_set("word").alias("words"),
    )
    scored = per_term.groupBy(EPOCH, ROW_ORD).agg(
        F.sum(F.when(F.col("mode") != "excluded", F.col("weight")).otherwise(0)).alias(
            "__score__"
        ),
        F.count_distinct(
            F.when(F.col("mode") == "required", F.col("term_id"))
        ).alias("__req_hits__"),
        F.max(F.when(F.col("mode") == "excluded", 1).otherwise(0)).alias("__excl__"),
        F.flatten(F.collect_list("words")).alias("__words__"),
    )
    matched = scored.filter(
        (F.col("__req_hits__") == F.lit(n_required)) & (F.col("__excl__") == 0)
    )
    if min_score is not None:
        matched = matched.filter(F.col("__score__") >= F.lit(min_score))

    rows_df = table._require_df().join(
        matched.select(EPOCH, ROW_ORD, "__score__", "__words__"),
        on=[EPOCH, ROW_ORD],
    )
    score_col = f"{attr}_search_score"
    words_col = f"{attr}_search_words"
    rows_df = rows_df.withColumn(score_col, F.col("__score__"))
    if include_words:
        rows_df = rows_df.withColumn(words_col, F.array_sort(F.array_distinct(F.col("__words__"))))
    rows_df = rows_df.drop("__score__", "__words__", "__req_hits__", "__excl__")
    rows_df = rows_df.orderBy(F.col(score_col).desc(), F.col(ROW_ORD).asc())
    if limit is not None:
        rows_df = rows_df.limit(limit)
    result = table._derive(rows_df, keep_sort=False)
    result._sort = [(score_col, False)]
    if as_table:
        return result
    out = []
    for ns in result:
        score = getattr(ns, score_col)
        out.append((ns, score))
    return out
