"""20M-edge pagerank probe (round 13, verdict task 7).

Measures, same-box A/B style (all numbers from ONE process, one
session — cross-run absolutes are not citable, see BASELINE.md):

1. per-iteration cost growth 2M -> 20M edges (timed as the delta
   between a 6-iteration and a 2-iteration run, so fixed setup cost
   cancels): the Pregel loop's step must scale with EDGES — ~10x at
   10x edges, never super-linear;
2. the warm-start recrawl story on a 1%-GROWN 20M graph (interleaved
   cold/warm A/B, medians): cold (uniform start) vs ``against_ranks=``
   warm start from the previous crawl's ranks, both with the same
   ``tol`` — iteration count and wall-clock savings are the recrawl
   payoff. (A 10% random rewire was probed first: it genuinely moves
   the stationary distribution, so warm start saved ~1 iteration —
   no start vector can skip real mixing time.)

Run: SPARK_DRIVER_MEMORY=48g python scripts/pagerank_probe.py
(local[32]; the runs keep several 20M-edge graphs + rank vectors
cached, which overflows the default 8g heap)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from littletable_spark import Table, get_spark

N_EDGES_1X = 2_000_000
TOL = 1e-4
MAX_ITERS = 40


def graph(spark, n_edges: int, name: str, salt: int = 0) -> Table:
    """Deterministic skewed link graph: ~n_edges/10 nodes, every 7th
    edge points at one of 97 hub nodes (the head-heavy shape real link
    graphs have). ``salt`` shifts the tail-edge targets so a grown
    graph's NEW edges rewire real mass, not duplicate rows."""
    n_nodes = max(n_edges // 10, 100)
    df = (
        spark.range(n_edges)
        .selectExpr(
            f"concat('n', cast(id % {n_nodes} as string)) AS src",
            "CASE WHEN id % 7 = 0 THEN concat('n', cast(id % 97 as string)) "
            f"ELSE concat('n', cast((id * 2654435761 + {salt}) "
            f"% {n_nodes} as string)) END AS dst",
        )
        .persist()
    )
    df.count()
    return Table.from_df(df, name=name)


def timed(label: str, fn, res: dict):
    t0 = time.perf_counter()
    out = fn()
    res[label] = round(time.perf_counter() - t0, 3)
    print(f"{label:28s} {res[label]:8.3f}s", flush=True)
    return out


def main() -> None:
    from littletable_spark.operators.graph import pagerank

    spark = get_spark(cpus=32)
    res: dict[str, float] = {}

    g1 = graph(spark, N_EDGES_1X, "g_2m")
    g10 = graph(spark, N_EDGES_1X * 10, "g_20m")

    def run(t: Table, iters: int, **kw) -> Table:
        out = pagerank(t, iterations=iters, **kw)
        out.df.agg(F.sum("rank")).collect()
        return out

    def done(out: Table) -> None:
        """Release a finished run's persisted rank vector — repeated
        probe runs otherwise accumulate caches until the heap fills
        (the r13b probe OOMed exactly this way)."""
        out.df.unpersist()

    done(run(g1, 2))  # untimed warmup
    done(timed("pr_2m_2iter", lambda: run(g1, 2), res))
    done(timed("pr_2m_6iter", lambda: run(g1, 6), res))
    done(timed("pr_20m_2iter", lambda: run(g10, 2), res))
    done(timed("pr_20m_6iter", lambda: run(g10, 6), res))
    per_iter_1 = (res["pr_2m_6iter"] - res["pr_2m_2iter"]) / 4
    per_iter_10 = (res["pr_20m_6iter"] - res["pr_20m_2iter"]) / 4
    print(f"per-iteration 2M:  {per_iter_1:6.3f}s")
    print(f"per-iteration 20M: {per_iter_10:6.3f}s")
    print(f"per-iteration growth at 10x edges: "
          f"{per_iter_10 / max(per_iter_1, 1e-9):5.2f}x")

    # ---- warm-start recrawl at 20M ----
    # previous crawl: converge cold on the ORIGINAL 20M graph, persist
    # the ranks through parquet (the documented against_ranks contract)
    cold_prev = timed(
        "pr_20m_cold_tol",
        lambda: run(g10, MAX_ITERS, tol=TOL),
        res,
    )
    prev_iters = cold_prev.pagerank_iterations
    print(f"cold converged in {prev_iters} iterations (tol={TOL})")
    path = "/tmp/pagerank_probe_prior.parquet"
    cold_prev.df.write.mode("overwrite").parquet(path)
    done(cold_prev)
    prior = Table.from_df(spark.read.parquet(path), name="prior")

    # recrawl: the grown graph = original 20M + 1% new salted edges —
    # the real recrawl shape (a crawl round adds a sliver of new pages;
    # a 10% random rewire would genuinely move the stationary
    # distribution and no start vector can skip that mixing time)
    extra = graph(spark, N_EDGES_1X // 10, "g_extra", salt=7919)
    grown_df = g10.df.unionByName(extra.df).persist()
    grown_df.count()
    grown = Table.from_df(grown_df, name="g_grown")

    # interleaved A/B (cold, warm, cold, warm) so box drift hits both
    # variants equally; medians reported
    colds, warms = [], []
    for rnd in (1, 2):
        c = timed(f"pr_grown_cold_tol_r{rnd}",
                  lambda: run(grown, MAX_ITERS, tol=TOL), res)
        colds.append((res[f"pr_grown_cold_tol_r{rnd}"],
                      c.pagerank_iterations))
        done(c)
        w = timed(f"pr_grown_warm_tol_r{rnd}",
                  lambda: run(grown, MAX_ITERS, tol=TOL,
                              against_ranks=prior), res)
        warms.append((res[f"pr_grown_warm_tol_r{rnd}"],
                      w.pagerank_iterations))
        done(w)
    cs = sorted(colds)[len(colds) // 2]
    ws = sorted(warms)[len(warms) // 2]
    print(f"grown graph (+1% edges): cold {cs[1]} iters / {cs[0]}s, "
          f"warm {ws[1]} iters / {ws[0]}s  (medians of interleaved A/B)")
    print(f"warm-start savings: {cs[1] - ws[1]} iterations "
          f"({cs[0] - ws[0]:+.3f}s)")


if __name__ == "__main__":
    main()
