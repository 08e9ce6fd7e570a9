"""Column statistics: ``Table.stats`` (littletable.py:3832-3915).

One JVM-side aggregation computes every statistic for every requested
field in a single pass (partial aggregation map-side); the tiny result is
reshaped driver-side into the reference's by-field / by-stat layouts.

- ``median`` is exact interpolated (matches Python ``statistics.median``
  and DuckDB ``median`` for numeric input), computed by the bounded
  bracket-narrowing selection in ``_exact_medians`` — never a global
  sort, never an unbounded per-partition value map. ``approx=True``
  swaps to single-pass ``percentile_approx`` — the 100 TB default when
  sketch error is acceptable.
- non-numeric values are excluded per field (reference filters them out,
  littletable.py:3869-3874): numeric-typed columns pass through; string
  columns are ``try_cast`` so unparseable cells count as missing.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F
from pyspark.sql import types as SQLT

from ..session import small_df
from ..table import Table

_NUMERIC_TYPES = (
    SQLT.ByteType,
    SQLT.ShortType,
    SQLT.IntegerType,
    SQLT.LongType,
    SQLT.FloatType,
    SQLT.DoubleType,
    SQLT.DecimalType,
)

STAT_NAMES = ["mean", "median", "min", "max", "variance", "std_dev", "count", "missing"]


# bracket sketch accuracy: rank error is n/_SKETCH_ACC = 0.0005n, well
# inside the ±0.002n quantile margin of _bracket_aggs, so the bracket
# always contains the true median; interior size stays ~0.005n, under
# band_limit for n <= 2M (beyond that the refinement rounds narrow it)
_SKETCH_ACC = 2_000


def _bracket_aggs(cols: dict[str, "F.Column"]) -> list:
    """Per-column [0.498, 0.502] quantile-bracket sketch aggregates —
    built separately so callers can fuse them into an existing single
    aggregation pass instead of paying a dedicated scan."""
    return [
        F.percentile_approx(
            col, F.array(F.lit(0.498), F.lit(0.502)), F.lit(_SKETCH_ACC)
        ).alias(f"{c}__bracket")
        for c, col in cols.items()
    ]


def _exact_medians(
    df,
    cols: dict[str, "F.Column"],
    counts: dict[str, int],
    band_limit: int = 10_000,
    max_iters: int = 4,
    brackets: dict[str, tuple] | None = None,
) -> dict[str, float | None]:
    """Interpolated exact medians (statistics.median / DuckDB semantics)
    for many columns with no global sort and a BOUNDED driver footprint.

    Distributed k-th selection by iterative bracket narrowing:
    1. mergeable quantile sketches bracket the median per column;
    2. a count-only pass measures each bracket's interior; while an
       interior holds more than ``band_limit`` values, the bracket is
       re-sketched *within the interior* at the median's interior rank —
       the interior shrinks by the sketch's bounded rank error each
       round, so a handful of count passes suffice at any scale;
    3. one final pass collects only the ≤``band_limit`` interior values
       per column (plus endpoint duplicate counts) and the k-th order
       statistics are reconstructed exactly driver-side.
    Falls back to Spark's `percentile` if a bracket misses (rank error
    exceeded) — never wrong, only slower.
    """
    live = {c: col for c, col in cols.items() if counts.get(c, 0) > 0}
    out: dict[str, float | None] = {c: None for c in cols}
    if not live:
        return out
    if brackets is None:
        approx = df.agg(*_bracket_aggs(live)).collect()[0]
        brackets = {c: approx[f"{c}__bracket"] for c in live}
    usable = {
        c
        for c in live
        if brackets.get(c) is not None
        and brackets[c][0] is not None
        and brackets[c][1] is not None
    }
    bounds = {c: (brackets[c][0], brackets[c][1]) for c in usable}
    stats: dict[str, dict] = {}
    bands: dict[str, list] = {}
    pending = set(usable)
    ready: set[str] = set()
    fallback: set[str] = set(live) - usable
    first_iter = True
    for _ in range(max_iters):
        if not pending:
            break
        aggs = []
        # fuse the band collect into the count pass when the interior is
        # PROVABLY small: interior <= 0.004n + 2*(n/_SKETCH_ACC) = 0.005n,
        # so n <= 200*band_limit guarantees <= band_limit values — one
        # whole scan saved (3 jobs -> 2) with the same driver bound. The
        # count-first path remains for larger n, where an over-eager
        # collect could ship an unboundedly large interior.
        fused = {
            c
            for c in pending
            if first_iter and counts[c] * 0.005 <= band_limit
        }
        for c in pending:
            col, (lo, hi) = live[c], bounds[c]
            aggs += [
                F.count(F.when(col < F.lit(lo), 1)).alias(f"{c}__below"),
                F.count(F.when(col == F.lit(lo), 1)).alias(f"{c}__nlo"),
                F.count(F.when(col == F.lit(hi), 1)).alias(f"{c}__nhi"),
                F.count(
                    F.when((col > F.lit(lo)) & (col < F.lit(hi)), 1)
                ).alias(f"{c}__m"),
            ]
            if c in fused:
                aggs.append(
                    F.sort_array(
                        F.collect_list(
                            F.when((col > F.lit(lo)) & (col < F.lit(hi)), col)
                        )
                    ).alias(f"{c}__band")
                )
        crow = df.agg(*aggs).collect()[0].asDict()
        refine = []
        for c in list(pending):
            stats[c] = {
                "below": crow[f"{c}__below"],
                "nlo": crow[f"{c}__nlo"],
                "nhi": crow[f"{c}__nhi"],
                "m": crow[f"{c}__m"],
            }
            if stats[c]["m"] <= band_limit:
                pending.discard(c)
                ready.add(c)
                if c in fused:
                    bands[c] = crow[f"{c}__band"]
            else:
                refine.append(c)
        first_iter = False
        if not refine:
            break
        raggs = []
        for c in refine:
            col, (lo, hi) = live[c], bounds[c]
            s = stats[c]
            n = counts[c]
            k1, k2 = (n - 1) // 2, n // 2
            # the medians' ranks inside the interior, with a sketch-error
            # margin; interior sketch accuracy 10000 -> rank error m/1e4
            j1 = (k1 - s["below"] - s["nlo"]) / s["m"]
            j2 = (k2 - s["below"] - s["nlo"]) / s["m"]
            f1 = min(max(j1 - 0.002, 0.0), 1.0)
            f2 = min(max(j2 + 0.002, 0.0), 1.0)
            raggs.append(
                F.percentile_approx(
                    F.when((col > F.lit(lo)) & (col < F.lit(hi)), col),
                    F.array(F.lit(f1), F.lit(f2)),
                    F.lit(_SKETCH_ACC),
                ).alias(c)
            )
        rrow = df.agg(*raggs).collect()[0]
        for c in refine:
            pair = rrow[c]
            if pair is None or pair[0] is None or pair[1] is None:
                pending.discard(c)
                fallback.add(c)
            else:
                bounds[c] = (pair[0], pair[1])
    fallback |= pending  # iteration budget exhausted -> exact percentile
    if ready:
        need_collect = [c for c in ready if c not in bands]
        if need_collect:
            baggs = []
            for c in need_collect:
                col, (lo, hi) = live[c], bounds[c]
                baggs.append(
                    F.sort_array(
                        F.collect_list(
                            F.when((col > F.lit(lo)) & (col < F.lit(hi)), col)
                        )
                    ).alias(c)
                )
            brow = df.agg(*baggs).collect()[0]
            for c in need_collect:
                bands[c] = brow[c]
        for c in ready:
            n = counts[c]
            k1, k2 = (n - 1) // 2, n // 2
            lo, hi = bounds[c]
            s = stats[c]
            band = bands[c]

            def kth(k: int, _s=s, _lo=lo, _hi=hi, _band=band):
                if k < _s["below"]:
                    return None
                k -= _s["below"]
                if k < _s["nlo"]:
                    return _lo
                k -= _s["nlo"]
                if k < len(_band):
                    return _band[k]
                k -= len(_band)
                if k < _s["nhi"]:
                    return _hi
                return None

            v1, v2 = kth(k1), kth(k2)
            if v1 is None or v2 is None:
                fallback.add(c)
            else:
                out[c] = (v1 + v2) / 2.0
    if fallback:
        # never wrong, only slower — and all fallback columns in ONE job
        frow = df.agg(
            *[F.percentile(live[c], F.lit(0.5)).alias(c) for c in fallback]
        ).collect()[0]
        for c in fallback:
            out[c] = frow[c]
    return out


def stats_table(
    table: Table,
    field_names: Any = None,
    by_field: bool = True,
    approx: bool = False,
) -> Table:
    df = table.df
    schema = {f.name: f.dataType for f in df.schema.fields}
    if field_names is None:
        fields = [
            c for c in df.columns if isinstance(schema[c], _NUMERIC_TYPES)
        ]
    elif isinstance(field_names, str):
        fields = field_names.replace(",", " ").split()
    else:
        fields = list(field_names)

    def _col(c: str):
        return (
            F.col(c).cast("double")
            if isinstance(schema.get(c), _NUMERIC_TYPES)
            else F.col(c).try_cast("double")
            if c in schema
            else F.lit(None).cast("double")
        )

    aggs = []
    for c in fields:
        col = _col(c)
        aggs += [
            F.avg(col).alias(f"{c}__mean"),
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
            F.var_samp(col).alias(f"{c}__variance"),
            F.stddev_samp(col).alias(f"{c}__std_dev"),
            F.count(col).alias(f"{c}__count"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{c}__missing"),
        ]
    if approx:
        # 100 TB path: one single pass, sketch-mergeable medians
        aggs += [
            F.percentile_approx(_col(c), F.lit(0.5), F.lit(10000)).alias(
                f"{c}__median"
            )
            for c in fields
        ]
        row = df.agg(*aggs).collect()[0].asDict()
    else:
        # one pass for the algebraic stats + the quantile-bracket
        # sketches (fused via the _bracket_aggs hook), then exact
        # medians for EVERY column through the bracket-narrowing
        # selection in _exact_medians. Round-7 A/B retired the old
        # cardinality router (approx_count_distinct per column -> a
        # shared value-histogram job for low-card columns): the bracket
        # path subsumes it — a low-card column's [0.498, 0.502] bracket
        # has a tiny (often empty) interior, so it resolves in the same
        # fused count+band job as everything else, and dropping the two
        # router jobs measured 1.7s vs 2.2s warm on the bench shape
        # (imperative aggs like acd don't fuse for free: agg CPU is
        # additive, 0.27 alg / 0.41 acd / 0.56 brackets -> 1.18 fused).
        # project to the stat columns once — explicit column pruning
        # every pass below inherits (an A/B also tried repartitioning
        # this projection when the source has few splits, like
        # ngram_jaccard does: it LOST locally — stats' per-job work is
        # tiny, so the exchange + cache write cost more than the extra
        # parallelism returned; the jaccard case wins because shingling
        # is CPU-heavy per row)
        stat_src = df.select(
            *[_col(c).alias(f"__st_{c}") for c in fields]
        )
        colmap = {c: F.col(f"__st_{c}") for c in fields}
        aggs = []
        for c in fields:
            col = colmap[c]
            aggs += [
                F.avg(col).alias(f"{c}__mean"),
                F.min(col).alias(f"{c}__min"),
                F.max(col).alias(f"{c}__max"),
                F.var_samp(col).alias(f"{c}__variance"),
                F.stddev_samp(col).alias(f"{c}__std_dev"),
                F.count(col).alias(f"{c}__count"),
                (F.count(F.lit(1)) - F.count(col)).alias(f"{c}__missing"),
            ]
        row = stat_src.agg(
            *aggs, *_bracket_aggs(colmap)
        ).collect()[0].asDict()
        counts = {c: int(row[f"{c}__count"]) for c in fields}
        live = {c: colmap[c] for c in fields if counts[c] > 0}
        medians: dict[str, float | None] = {c: None for c in fields}
        if live:
            medians.update(
                _exact_medians(
                    stat_src,
                    live,
                    counts,
                    brackets={c: row[f"{c}__bracket"] for c in live},
                )
            )
        for c in fields:
            row[f"{c}__median"] = medians[c]

    # reference-parity rounding (littletable.py:3882-3889): mean/median/
    # variance/std_dev round to max(4-magnitude, 0) digits when |v| > 1;
    # min/max/count/missing stay exact. Applied driver-side to the tiny
    # collected summary, so the distributed plan is untouched.
    import math

    def _ref_round(v):
        if v is None or v == 0.0:
            return v
        if abs(v) > 1:
            mag = int(math.log10(abs(v))) + 1
            return round(v, max(4 - mag, 0))
        return v

    for c in fields:
        for s in ("mean", "median", "variance", "std_dev"):
            row[f"{c}__{s}"] = _ref_round(row[f"{c}__{s}"])

    spark = table.spark
    if by_field:
        recs = [
            {
                "name": c,
                **{s: row[f"{c}__{s}"] for s in STAT_NAMES},
            }
            for c in fields
        ]
        schema_str = (
            "name string, mean double, median double, min double, max double, "
            "variance double, std_dev double, count long, missing long"
        )
        out = small_df(spark, recs, schema_str)
    else:
        recs = [
            {"stat": s, **{c: float(row[f"{c}__{s}"]) if row[f"{c}__{s}"] is not None else None for c in fields}}
            for s in STAT_NAMES
        ]
        schema_str = "stat string, " + ", ".join(f"`{c}` double" for c in fields)
        out = small_df(spark, recs, schema_str)
    t = Table.from_df(out, name=f"{table.table_name}_stats")
    return t


def corpus_report(
    table: Table,
    text_col: str,
    by: Any = ("lang", "source"),
) -> Table:
    """Per-group curation summary — the "what did I end up with" step
    after a curation run: document counts, char/token totals and
    means, EXACT token-count percentiles (p50/p95), empty-doc counts,
    one row per group.

    Scale shape: token counts are computed once in the projection
    (JVM-side split), then ONE map-combined groupBy shuffle carries a
    handful of scalars per doc; the exact ``percentile`` aggregate
    sorts within each group, which is fine at report granularity
    (groups ≪ corpus — lang × source, not doc-level). Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` interpolate
    identically (A/B verified bit-equal), so the report is fully
    oracle-checkable. For percentiles of an UNGROUPED corpus-sized
    column use ``stats_table(approx=True)``'s sketch path instead.
    """
    from .dedup import _tokens

    if isinstance(by, str):
        by = by.replace(",", " ").split()
    by = list(by)
    if not by:
        raise ValueError("corpus_report needs at least one grouping column")
    safe = F.coalesce(F.col(text_col), F.lit(""))
    df = table._require_df().select(
        *by,
        F.size(_tokens(safe)).alias("__ntok__"),
        F.length(safe).alias("__nchr__"),
        F.when(F.trim(safe) == F.lit(""), 1).otherwise(0).alias("__emp__"),
    )
    out = df.groupBy(*by).agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("__emp__").cast("int").alias("n_empty"),
        F.sum("__nchr__").cast("long").alias("n_chars_total"),
        F.sum("__ntok__").cast("long").alias("n_tokens_total"),
        (
            F.sum("__ntok__") * F.lit(1.0) / F.count(F.lit(1))
        ).alias("mean_tokens"),
        F.expr("percentile(__ntok__, 0.5)").alias("p50_tokens"),
        F.expr("percentile(__ntok__, 0.95)").alias("p95_tokens"),
        F.max("__ntok__").cast("int").alias("max_tokens"),
    )
    return Table.from_df(out, name=f"{table.table_name}_report")


def skew_report(table: Table, cols: Any, top_k: int = 10) -> Table:
    """Per-column heavy-hitter report: for each named column, the
    ``top_k`` most frequent values with their exact count, the share of
    the column they represent, and a frequency rank. The DATA-side
    complement of the plan linter (plans/lint.py): lint says the plan
    has a skew-prone shape, skew_report says whether the data will
    actually skew it — run it on join/groupBy key candidates before
    committing a partitioning (one key value carrying 30% of a column
    means salting or AQE skew handling at 100 TB, and a NULL-heavy join
    key silently empties inner joins — NULL is reported as a value for
    exactly that reason).

    One scan: an explode of an array<struct> literal unpivots
    (col_name, value-as-string) pairs JVM-side (the same Generate that
    SQL ``stack`` plans to — no Python, no shuffle, and column names
    ride as data so they are never parsed), one
    map-combined groupBy counts them, and the per-column share + rank
    are windows over the already-tiny aggregate (row_number's filter
    plans as WindowGroupLimit). Rank order is total: ties break on the
    value itself, NULLS FIRST on both engines.
    """
    if isinstance(cols, str):
        cols = cols.split()
    cols = list(cols)
    if not cols:
        raise ValueError("skew_report needs at least one column")
    df = table._require_df()
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"skew_report: no such column(s) {missing}")
    if top_k <= 0:
        raise ValueError("top_k must be positive")
    from pyspark.sql import Window

    # pure-Column unpivot (explode of an array<struct> literal): the
    # same JVM-side Generate the SQL stack() plans to, but with column
    # names carried as data, never parsed — a positional toDF rename
    # sidesteps name resolution entirely, so a column name containing
    # a quote or backtick can't corrupt (or even reach) the analyzer
    idx = {c: i for i, c in enumerate(df.columns)}
    safe = df.toDF(*[f"__c{i}__" for i in range(len(df.columns))])
    pairs = safe.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"__c{idx[c]}__").cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("__pair__")
    ).select("__pair__.col_name", "__pair__.value")
    cnts = pairs.groupBy("col_name", "value").agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.partitionBy("col_name")
    wr = wc.orderBy(F.col("cnt").desc(), F.col("value").asc_nulls_first())
    out = (
        cnts.withColumn("share", F.col("cnt") / F.sum("cnt").over(wc))
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= F.lit(int(top_k)))
    )
    return Table.from_df(out, name=f"{table.table_name}_skew")
