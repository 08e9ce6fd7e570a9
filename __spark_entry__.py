"""Driver contract for the spark-graft builder (PySpark target).

Every query below exercises the ``littletable_spark`` public API (not raw
Spark) so the correctness gate covers the engine's operators from
SURVEY.md §2. Each has a DuckDB oracle in ``oracle_sql`` unless the
operation is not SQL-expressible (noted per query).

Determinism notes:
- aggregates over doubles are rounded in BOTH engines so summation-order
  float drift cannot flip the value hash;
- timestamps are compared via epoch seconds (TZ-independent in both
  Spark and DuckDB) rather than rendered timestamps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from littletable_spark import Table


def _t(spark: SparkSession, sf_dir: str, name: str) -> Table:
    return Table.parquet_import(spark, f"{sf_dir}/{name}.parquet", name)


# --------------------------------------------------------------------- #
# §2.2 projections / filters / predicates


def q_where_comparators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """where() with gt/between/eq comparators -> select projection."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.where(
        l_quantity=Table.gt(30.0),
        l_discount=Table.between(0.01, 0.08),
        l_returnflag="N",
    ).select("l_orderkey l_linenumber l_quantity l_discount l_extendedprice")
    return out.df


def q_where_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_in / startswith / within comparators on part."""
    p = _t(spark, sf_dir, "part")
    out = p.where(
        p_brand=Table.is_in(["Brand#1", "Brand#2", "Brand#3"]),
        p_name=Table.startswith("a"),
        p_size=Table.within(10, 40),
    ).select("p_partkey p_name p_brand p_size")
    return out.df


def q_select_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select() with a computed column (native expression, no UDF)."""
    p = _t(spark, sf_dir, "part")
    out = p.select(
        "p_partkey p_retailprice p_size",
        inventory_value=F.round(F.col("p_retailprice") * F.col("p_size"), 2),
    )
    return out.df


def q_compute_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compute_field (add_field) derived column + where on it."""
    li = _t(spark, sf_dir, "lineitem")
    # no round(): the scalar double expression is bit-identical across
    # engines; rounding functions differ in tie handling
    li.compute_field("net_price", F.col("l_extendedprice") * (1 - F.col("l_discount")))
    out = li.where(net_price=Table.gt(50000.0)).select(
        "l_orderkey l_linenumber net_price"
    )
    return out.df


def q_splitby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """splitby -> the matching side (high-value orders)."""
    o = _t(spark, sf_dir, "orders")
    _, high = o.splitby(o_totalprice=Table.ge(100000.0))
    return high.select("o_orderkey o_totalprice o_orderpriority").df


def q_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delete() filtered rows in place; return the survivors."""
    o = _t(spark, sf_dir, "orders")
    o.delete(o_orderstatus="F")
    return o.select("o_orderkey o_orderstatus o_totalprice").df


def q_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderby + unique(): keep-first dedup in sorted table order."""
    li = _t(spark, sf_dir, "lineitem")
    li.orderby("l_orderkey, l_linenumber")
    out = li.unique(key="l_orderkey").select("l_orderkey l_linenumber")
    return out.df


# --------------------------------------------------------------------- #
# §2.3 joins


def q_join_3way_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, revenue per market segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = c.join(o, **{"c_custkey": "o_custkey"}).join(li, **{"o_orderkey": "l_orderkey"})
    out = j.groupby_with_summaries(
        "c_mktsegment",
        revenue=F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2),
        n_items=F.count(F.lit(1)),
    )
    return out.df


def q_outer_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT outer join keeps customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.outer_join(Table.LEFT_OUTER_JOIN, o, **{"c_custkey": "o_custkey"})
    out = j.groupby_with_summaries(
        "c_custkey",
        n_orders=F.count(F.col("o_orderkey")),
        total_spend=F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2),
    )
    return out.df


def q_outer_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL outer join nation ⟗ supplier (unmatched nations survive)."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    j = n.outer_join(Table.FULL_OUTER_JOIN, s, **{"n_nationkey": "s_nationkey"})
    return j.select("n_nationkey n_name s_suppkey s_name").df


def q_join_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join_on + DSL chain: region + nation + customer."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    # after r⋈n the accumulated table exposes n_nationkey for the next hop
    joined = (
        r.join_on("r_regionkey") + n.join_on("n_regionkey")
    )().join_on("n_nationkey") + c.join_on("c_nationkey")
    out = joined().select("r_name n_name c_custkey c_name")
    return out.df


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customers having at least one order (left_semi)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.semi_join(o, ("c_custkey", "o_custkey")).select("c_custkey c_name").df


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customers with no orders (left_anti)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.anti_join(o, ("c_custkey", "o_custkey")).select("c_custkey c_name").df


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bag union (+) of two filtered subsets — UNION ALL semantics."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.where(o_orderpriority="1-URGENT")
    high = o.where(o_orderpriority="2-HIGH")
    both = urgent + high
    return both.select("o_orderkey o_orderpriority o_totalprice").df


# --------------------------------------------------------------------- #
# §2.4 aggregation / grouping / pivot


def q_groupby_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary via groupby_with_summaries."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.groupby_with_summaries(
        "l_returnflag l_linestatus",
        sum_qty=F.round(F.sum("l_quantity"), 2),
        sum_base_price=F.round(F.sum("l_extendedprice"), 2),
        sum_disc_price=F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ),
        avg_qty=F.round(F.avg("l_quantity"), 4),
        avg_price=F.round(F.avg("l_extendedprice"), 4),
        count_order=F.count(F.lit(1)),
    )
    return out.df


def q_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot(a b).as_table(): per-combination counts."""
    o = _t(spark, sf_dir, "orders")
    pt = o.pivot("o_orderpriority o_orderstatus")
    return pt.as_table().df


def q_pivot_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot with a sum aggregate cell function."""
    li = _t(spark, sf_dir, "lineitem")
    pt = li.pivot("l_returnflag l_linestatus")
    out = pt.as_table(sum, "l_quantity")
    return out.select(
        "l_returnflag l_linestatus",
        sum_l_quantity=F.round(F.col("sum_l_quantity"), 2),
    ).df


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollup totals (capability the reference only has inside dump_counts)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.rollup(
        ["l_returnflag", "l_linestatus"],
        sum_qty=F.round(F.sum("l_quantity"), 2),
        n=F.count(F.lit(1)),
    )
    return out.df


def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats(): per-column summary statistics."""
    li = _t(spark, sf_dir, "lineitem")
    st = li.stats(["l_quantity", "l_discount", "l_extendedprice"])
    return st.select(
        "name count missing",
        mean=F.round(F.col("mean"), 4),
        median=F.round(F.col("median"), 4),
        min=F.round(F.col("min"), 4),
        max=F.round(F.col("max"), 4),
        variance=F.round(F.col("variance"), 4),
        std_dev=F.round(F.col("std_dev"), 4),
    ).df


# --------------------------------------------------------------------- #
# §2.5 sort / limit / rank / window


def q_orderby_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderby desc + head — top-25 orders by total price."""
    o = _t(spark, sf_dir, "orders")
    o.orderby("o_totalprice desc, o_orderkey")
    return o.head(25).select("o_orderkey o_totalprice").df


def q_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank(): positional ranking in current sort order."""
    c = _t(spark, sf_dir, "customer")
    c.orderby("c_acctbal desc, c_custkey")
    c.rank("bal_rank")
    return c.where(bal_rank=Table.le(50)).select("c_custkey bal_rank").df


def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top-3 orders per customer via window function (net-new capability)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    out = o.select(
        "o_custkey o_orderkey o_totalprice",
        rn=F.row_number().over(w),
    ).where(rn=Table.le(3))
    return out.df


def q_slice_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """index range query by.<attr>[lo:hi] (ge/lt half-open semantics)."""
    o = _t(spark, sf_dir, "orders")
    o.create_index("o_totalprice")
    sub = o.by.o_totalprice[50000.0:150000.0]
    return sub.select("o_orderkey o_totalprice").df


# --------------------------------------------------------------------- #
# events (epoch-based so Spark/DuckDB agree independent of session TZ)


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tumbling 1-hour window aggregation over the events table."""
    from littletable_spark.streaming import load_events, tumbling_window

    e = load_events(spark, f"{sf_dir}/events.parquet")
    out = tumbling_window(
        e,
        3600,
        keys=["event_type"],
        n_events=F.count(F.lit(1)),
        total_value=F.round(F.sum("value"), 2),
    )
    return out.df


def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "where_comparators": q_where_comparators,
        "where_predicates": q_where_predicates,
        "select_computed": q_select_computed,
        "compute_field": q_compute_field,
        "splitby": q_splitby,
        "delete": q_delete,
        "unique": q_unique,
        "join_3way_agg": q_join_3way_agg,
        "outer_join_left": q_outer_join_left,
        "outer_join_full": q_outer_join_full,
        "join_dsl": q_join_dsl,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "union": q_union,
        "groupby_summaries": q_groupby_summaries,
        "pivot_counts": q_pivot_counts,
        "pivot_sum": q_pivot_sum,
        "rollup": q_rollup,
        "stats": q_stats,
        "orderby_head": q_orderby_head,
        "rank": q_rank,
        "window_topk_per_group": q_window_topk_per_group,
        "slice_range": q_slice_range,
        "events_tumbling": q_events_tumbling,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_join_3way_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry()


def oracle_sql() -> dict[str, str]:
    return {
        "where_comparators": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
            FROM lineitem
            WHERE l_quantity > 30.0
              AND l_discount > 0.01 AND l_discount < 0.08
              AND l_returnflag = 'N'
        """,
        "where_predicates": """
            SELECT p_partkey, p_name, p_brand, p_size
            FROM part
            WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
              AND p_name LIKE 'a%'
              AND p_size BETWEEN 10 AND 40
        """,
        "select_computed": """
            SELECT p_partkey, p_retailprice, p_size,
                   round(p_retailprice * p_size, 2) AS inventory_value
            FROM part
        """,
        "compute_field": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) AS net_price
            FROM lineitem
            WHERE l_extendedprice * (1 - l_discount) > 50000.0
        """,
        "splitby": """
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders WHERE o_totalprice >= 100000.0
        """,
        "delete": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE NOT (o_orderstatus = 'F')
        """,
        "unique": """
            SELECT l_orderkey, l_linenumber FROM (
              SELECT l_orderkey, l_linenumber,
                     row_number() OVER (PARTITION BY l_orderkey
                                        ORDER BY l_linenumber) AS rn
              FROM lineitem) WHERE rn = 1
        """,
        "join_3way_agg": """
            SELECT c_mktsegment,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY c_mktsegment
        """,
        "outer_join_left": """
            SELECT c_custkey,
                   count(o_orderkey) AS n_orders,
                   round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spend
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        """,
        "outer_join_full": """
            SELECT coalesce(n_nationkey, s_nationkey) AS n_nationkey,
                   n_name, s_suppkey, s_name
            FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
        """,
        "join_dsl": """
            SELECT r_name, n_name, c_custkey, c_name
            FROM region
            JOIN nation ON r_regionkey = n_regionkey
            JOIN customer ON n_nationkey = c_nationkey
        """,
        "semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "union": """
            SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM orders WHERE o_orderpriority = '2-HIGH'
        """,
        "groupby_summaries": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   count(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "pivot_counts": """
            SELECT o_orderpriority, o_orderstatus, count(*) AS count
            FROM orders GROUP BY o_orderpriority, o_orderstatus
        """,
        "pivot_sum": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_l_quantity
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "rollup": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "stats": """
            WITH s AS (
              SELECT 'l_quantity' AS name, count(l_quantity) AS count,
                     count(*) - count(l_quantity) AS missing,
                     round(avg(l_quantity), 4) AS mean,
                     round(median(l_quantity), 4) AS median,
                     round(min(l_quantity), 4) AS min,
                     round(max(l_quantity), 4) AS max,
                     round(var_samp(l_quantity), 4) AS variance,
                     round(stddev_samp(l_quantity), 4) AS std_dev
              FROM lineitem
              UNION ALL
              SELECT 'l_discount', count(l_discount),
                     count(*) - count(l_discount),
                     round(avg(l_discount), 4), round(median(l_discount), 4),
                     round(min(l_discount), 4), round(max(l_discount), 4),
                     round(var_samp(l_discount), 4), round(stddev_samp(l_discount), 4)
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', count(l_extendedprice),
                     count(*) - count(l_extendedprice),
                     round(avg(l_extendedprice), 4), round(median(l_extendedprice), 4),
                     round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
                     round(var_samp(l_extendedprice), 4), round(stddev_samp(l_extendedprice), 4)
              FROM lineitem
            ) SELECT * FROM s
        """,
        "orderby_head": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
        """,
        "rank": """
            SELECT c_custkey, bal_rank FROM (
              SELECT c_custkey,
                     row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS bal_rank
              FROM customer) WHERE bal_rank <= 50
        """,
        "window_topk_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) WHERE rn <= 3
        """,
        "slice_range": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_totalprice >= 50000.0 AND o_totalprice < 150000.0
        """,
        "events_tumbling": """
            SELECT (epoch_ns(ts) // 1000000000)
                     - ((epoch_ns(ts) // 1000000000) % 3600) AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events
            GROUP BY 1, 2
        """,
    }
