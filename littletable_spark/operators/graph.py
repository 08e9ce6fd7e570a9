"""Link-graph operators for crawl prioritization.

``pagerank``: the classic authority score over a ``(src, dst)`` edge
table — the standard crawl-frontier prioritization signal (feed the
ranks into ``schedule_fetches(priority_col=)`` and high-authority
pages fetch first). Damped power iteration with dangling-mass
redistribution:

    PR_{k+1}(v) = (1-d)/N + d * ( Σ_{(u,v)∈E} PR_k(u)/outdeg(u)
                                  + dangling_k / N )

where ``dangling_k`` is the total rank of nodes with no out-edges.
Duplicate edges contribute once per occurrence (multiset semantics,
matching what ``extract_links`` emits for repeated links).

Scale shape: the edge table joins RANKS (node-sized) to EDGES
(edge-sized) once per iteration — a standard Pregel-style loop of k
hash joins + k map-combined groupBys; ranks persist per step and the
previous step unpersists, so lineage stays O(1). The only driver-side
work per iteration is the dangling-mass SCALAR fold (one number).
Deterministic up to float summation order; the oracle gate compares
at 1e-6, far above the ~1e-15 relative reorder error.

No reference analog; net-new crawl capability like robots/urlops.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..table import Table

__all__ = ["pagerank"]


def pagerank(
    table: Table,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    node_out: str = "node",
    rank_out: str = "rank",
) -> Table:
    """Rank every node of the edge table: ``(node, rank)``, ranks
    summing to 1. Nodes appearing only as destinations rank too;
    dangling nodes (no out-edges) redistribute their mass uniformly."""
    if iterations < 1:
        raise ValueError("pagerank: iterations must be >= 1")
    df = table._require_df()
    edges = (
        df.select(
            F.col(src_col).alias("__src__"), F.col(dst_col).alias("__dst__")
        )
        .where(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
        .persist()
    )
    nodes = (
        edges.select(F.col("__src__").alias(node_out))
        .union(edges.select(F.col("__dst__").alias(node_out)))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return Table.from_df(
            nodes.withColumn(rank_out, F.lit(None).cast("double")),
            name=f"{table.table_name}_pagerank",
        )
    outdeg = edges.groupBy("__src__").agg(F.count(F.lit(1)).alias("__deg__"))
    # per-edge contribution denominator attached once, reused every step
    edges_w = edges.join(outdeg, "__src__").persist()
    edges_w.count()
    d = float(damping)
    base = (1.0 - d) / n
    ranks = nodes.withColumn(rank_out, F.lit(1.0 / n)).persist()
    for _ in range(iterations):
        dangling = (
            ranks.join(
                outdeg, ranks[node_out] == outdeg["__src__"], "left_anti"
            )
            .agg(F.coalesce(F.sum(rank_out), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            ranks.join(edges_w, ranks[node_out] == edges_w["__src__"])
            .select(
                F.col("__dst__").alias(node_out),
                (F.col(rank_out) / F.col("__deg__")).alias("__c__"),
            )
            .groupBy(node_out)
            .agg(F.sum("__c__").alias("__c__"))
        )
        new_ranks = (
            nodes.join(contrib, node_out, "left")
            .select(
                F.col(node_out),
                (
                    F.lit(base)
                    + F.lit(d)
                    * (F.coalesce(F.col("__c__"), F.lit(0.0))
                       + F.lit(dangling / n))
                ).alias(rank_out),
            )
            .persist()
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    # ranks is materialized; the build-side caches can go
    edges_w.unpersist()
    edges.unpersist()
    nodes.unpersist()
    return Table.from_df(ranks, name=f"{table.table_name}_pagerank")
