"""Deterministic sampling operators for corpus curation.

Net-new over the reference (single-node littletable has no sampling;
SURVEY §2 pipeline mandate). All operators key their randomness on an
md5 of a caller-named key column, NOT on Spark's partition-seeded RNG
(`df.sample`), so results are:

- reproducible across runs, cluster sizes, partitionings, and AQE
  re-plans (a `df.sample` result changes whenever partitioning does);
- engine-portable: DuckDB computes the identical sample with
  ``('0x' || substring(md5(coalesce(key::VARCHAR, chr(0)) || salt), 1, 8))::BIGINT``
  (the chr(0) sentinel mirrors hash_bucket's NULL handling) — which is
  what makes these oracle-checkable;
- stable under incremental re-runs: a doc's keep/drop decision never
  changes when other rows are added or removed — the property that
  makes hash sampling the standard for 100 TB training-data splits
  (a re-shard or a late-arriving shard cannot flip earlier decisions).

Everything is a narrow whole-stage-codegen projection + filter: no
shuffle, no UDF, no driver state. ``sample_fixed`` adds one TakeOrdered
(distributed per-partition top-k, then a k-row merge on the driver).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..table import Table

# 2^32: the md5-prefix hash below is uniform on [0, 2^32)
_HASH_SPACE = 4294967296.0


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform deterministic value on [0, 2^32): first 8 hex chars of
    md5(key || salt) as an integer. Portable: DuckDB mirrors it as
    ``('0x' || substring(md5(coalesce(key::VARCHAR, chr(0)) || salt), 1, 8))::BIGINT``.

    NULL keys hash as the sentinel ``chr(0)`` (a string no real key
    renders as) instead of propagating NULL — a NULL-keyed row must land
    in exactly one side of a split / keep-or-drop decision, never be
    silently dropped from both (the disjoint-union invariant of
    ``split_train_test``)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.coalesce(key.cast("string"), F.lit("\x00")), F.lit(salt))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def resample_to_mixture(
    table: Table,
    source_col: str,
    weights: Mapping[Any, float],
    key_col: str,
    salt: str = "",
    temperature: float = 1.0,
) -> Table:
    """Deterministically down-sample so the ``source_col`` distribution
    matches the target ``weights`` (data mixing for training corpora:
    "60% web, 30% code, 10% papers"). Keeps the maximum feasible volume:
    the scarcest source relative to its target weight is kept whole, and
    every other source is hash-thinned to proportion.

    Given observed counts N_s and normalized weights w_s, the max
    feasible total is T = min_s(N_s / w_s); each source keeps
    ``w_s * T / N_s`` of its rows via the same md5 ``hash_bucket``
    filter as the other samplers — so the selection is reproducible,
    re-shard-stable, and engine-portable (the DuckDB oracle recomputes
    the identical fractions from the same counts with the same
    operation order, so even the double-precision thresholds agree
    bit-for-bit). Sources absent from ``weights`` are dropped.

    Collect-free plan: counts aggregate -> single-row global min ->
    per-source fraction table broadcast back onto the stream — three
    tiny aggregations and one broadcast join; the corpus itself is
    scanned once and never shuffled.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    # temperature-scaled mixing (the multilingual-sampling trick from
    # the XLM-R line of work): w^(1/T) then renormalize. T=1 keeps the
    # stated proportions; T>1 flattens toward uniform so low-resource
    # sources are up-weighted relative to their raw share; T<1
    # sharpens. Applied driver-side to the literal weights, so the plan
    # and the oracle see ordinary constants.
    scaled = {k: float(v) ** (1.0 / temperature) for k, v in weights.items()}
    total_w = float(sum(scaled.values()))
    norm = {k: float(v) / total_w for k, v in scaled.items()}
    df = table._require_df()
    w_expr = F.create_map(
        *[x for k, v in sorted(norm.items()) for x in (F.lit(k), F.lit(v))]
    )
    counts = (
        df.groupBy(F.col(source_col).alias("__src__"))
        .agg(F.count(F.lit(1)).alias("__n__"))
        .withColumn("__w__", w_expr[F.col("__src__")])
        .where(F.col("__w__").isNotNull())
    )
    t_row = counts.agg(
        F.min(F.col("__n__") / F.col("__w__")).alias("__t__")
    )
    fracs = counts.crossJoin(F.broadcast(t_row)).select(
        "__src__",
        (F.col("__w__") * F.col("__t__") / F.col("__n__")).alias("__frac__"),
    )
    out = (
        df.join(
            F.broadcast(fracs), df[source_col] == F.col("__src__"), "inner"
        )
        .where(
            hash_bucket(F.col(key_col), salt)
            < F.lit(_HASH_SPACE) * F.col("__frac__")
        )
        .drop("__src__", "__frac__")
    )
    return table._derive(out)


def sample_hash(table: Table, key_col: str, fraction: float, salt: str = "") -> Table:
    """Deterministic Bernoulli sample: keep rows whose key hashes below
    ``fraction`` of the hash space. Pure codegen filter, no shuffle."""
    df = table._require_df()
    keep = hash_bucket(F.col(key_col), salt) < F.lit(_HASH_SPACE * fraction)
    return table._derive(df.where(keep))


def sample_stratified(
    table: Table,
    strata_col: str,
    fractions: Mapping[Any, float],
    key_col: str,
    salt: str = "",
    default: float = 0.0,
) -> Table:
    """Per-stratum deterministic sampling (the `sampleBy` shape, but
    reproducible and oracle-checkable): each stratum keeps its own
    fraction, keyed on ``key_col``. Strata missing from ``fractions``
    keep ``default`` (0.0 = dropped)."""
    df = table._require_df()
    frac: Column = F.lit(float(default))
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == F.lit(value), F.lit(float(f))).otherwise(frac)
    keep = hash_bucket(F.col(key_col), salt).cast("double") < frac * F.lit(_HASH_SPACE)
    return table._derive(df.where(keep))


def sample_fixed(table: Table, key_col: str, k: int, salt: str = "") -> Table:
    """Deterministic uniform-without-replacement k-row sample: the k
    smallest key hashes (a minwise sample — uniform over subsets of
    size k, and nested: the k=100 sample contains the k=50 sample).
    Physical plan is TakeOrderedAndProject: per-partition top-k, one
    k-row driver merge — no global sort, no full shuffle."""
    df = table._require_df()
    h = hash_bucket(F.col(key_col), salt)
    out = (
        df.withColumn("__h__", h)
        .orderBy(F.col("__h__"), F.col(key_col))
        .limit(int(k))
        .drop("__h__")
    )
    return table._derive(out)


def weighted_sample_score(
    key_col: str, weight_col: str, salt: str = ""
) -> Column:
    """The A-ES selection score as a reusable Column: ln(u)/w with the
    module's md5 u-draw — EXACTLY what ``sample_weighted`` orders by.
    This is the corpus-scale escape hatch its docstring prescribes:
    estimate a cutoff from a small probe, then
    ``df.where(weighted_sample_score(...) >= cutoff)`` — one scan, no
    per-task top-k heaps, same distribution up to the cutoff estimate.
    NULL/non-positive weights yield NULL (never selected by any
    >=-cutoff filter), matching sample_weighted's exclusion."""
    w = F.col(weight_col).cast("double")
    u = (hash_bucket(F.col(key_col), salt) + F.lit(0.5)) / F.lit(_HASH_SPACE)
    return F.when(w.isNotNull() & (w > 0), F.log(u) / w)


def sample_weighted(
    table: Table,
    k: int,
    weight_col: str,
    key_col: str,
    salt: str = "",
) -> Table:
    """Deterministic WEIGHTED sampling without replacement
    (Efraimidis–Spirakis A-ES): every row draws u = (hash_bucket(key,
    salt) + 0.5) / 2^32 ∈ (0,1) and the k largest u^(1/w) win —
    equivalently the k largest ln(u)/w, computed that way so the
    score is one log and one divide. Inclusion is exactly
    weight-proportional for k=1 and the standard A-ES sequential-
    sampling distribution for k>1 — the quality-weighted corpus
    selection step (keep k docs, preferring high quality-score) that
    uniform hash sampling can't express.

    Same determinism contract as the rest of this module: md5-keyed,
    so the selection is reproducible across runs/partitionings and
    NESTED (the k=10k sample contains the k=1k sample — the scores
    are fixed per row, only the cutoff moves). Rows with NULL or
    non-positive weight are excluded — weight 0 means "never sample",
    and a NULL weight must not silently win with u alone.

    Physical plan is TakeOrderedAndProject like ``sample_fixed``:
    per-partition top-k, one k-row driver merge — no global sort.
    That shape bounds k: every task holds a k-row heap of FULL rows
    and the merge materializes k rows in one buffer, so it is right
    for k up to the low millions of skinny rows. For corpus-scale
    selections (tens of millions of text-bearing rows) run the same
    score as a projection and threshold it instead: pick the cutoff
    from a small ``sample_fixed`` quantile probe, then
    ``where(score >= cutoff)`` — one scan, no heaps, same
    distribution up to the cutoff estimate. The total order is
    (score desc, key asc); engines may differ in the last ulp of
    ln(), so keep the raw score OUT of hash-checked oracle outputs
    (selection flips need two scores within ~1e-16 at the cutoff —
    negligible; value mismatches on an emitted score would not be).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    df = table._require_df()
    w = F.col(weight_col).cast("double")
    out = (
        df.where(w.isNotNull() & (w > 0))
        .withColumn(
            "__s__", weighted_sample_score(key_col, weight_col, salt)
        )
        .orderBy(F.col("__s__").desc(), F.col(key_col))
        .limit(int(k))
        .drop("__s__")
    )
    return table._derive(out)


def split_train_test(
    table: Table, key_col: str, test_fraction: float, salt: str = ""
) -> tuple[Table, Table]:
    """Deterministic (train, test) split on a key hash: disjoint, union
    = input, and a row's side never changes when other rows come or go
    — late-arriving shards of a 100 TB corpus cannot leak train rows
    into test. Returns (train, test)."""
    df = table._require_df()
    is_test = hash_bucket(F.col(key_col), salt) < F.lit(_HASH_SPACE * test_fraction)
    return table._derive(df.where(~is_test)), table._derive(df.where(is_test))


def cap_per_group(
    table: Table,
    group_col: str,
    cap: int,
    key_col: str,
    salt: str = "",
    weight_col: str | None = None,
    min_weight: float = 0.0,
) -> Table:
    """Keep at most ``cap`` rows per group — the per-source/per-domain
    quota step of corpus curation (one crawl domain must not dominate
    the training mix no matter how many documents it contributed).

    With ``weight_col`` the quota is a BUDGET over summed weight instead
    of a row count — the token-budget form of the same step ("at most
    2M tokens per source", the unit mixtures are actually specified
    in). A row survives iff the running weight total up to AND
    including it stays ≤ ``cap``; survivors are always a STRICT PREFIX
    of the group's minwise order — a row too heavy for the remaining
    budget busts it for everything ranked at or after it (no
    skip-and-continue knapsack; the running sum keeps counting dropped
    rows, which is what makes the decision nested and re-shard-stable).

    Which rows survive is a deterministic minwise choice: rows are
    ranked inside their group by ``md5(key || salt)`` (ties broken by
    the key itself — a total order whenever ``key_col`` is unique, the
    same discipline tests/test_total_order.py enforces) and the prefix
    that fits keeps. Like every operator here the decision is
    re-shard-stable AND nested (raising the cap only ever ADDS
    survivors — the cumulative sums are fixed by the ordering, only the
    threshold moves), but unlike pure hash thinning it is exact: a
    group under budget keeps everything.

    Scale: one shuffle on ``group_col``. The row-count form plans the
    rank filter as WindowGroupLimit (per-partition group top-k before
    the exchange), so the shuffle carries at most ~``cap`` rows per
    group per input partition — skewed groups (exactly the motivating
    case: one domain with 10^8 docs) are bounded map-side. A window
    SUM gets no such pre-shuffle bound, so the weighted form accepts
    ``min_weight``: when every row weighs at least that much, rank
    > cap/min_weight + 1 provably busts the budget, and the SAME
    WindowGroupLimit rank cut prunes the shuffle map-side (for token
    budgets over non-empty documents min_weight=1 is always sound).
    """
    from pyspark.sql import Window

    if cap <= 0:
        raise ValueError("cap must be positive")
    df = table._require_df()
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    if weight_col is None:
        out = (
            df.withColumn("__rk__", F.row_number().over(w))
            .where(F.col("__rk__") <= F.lit(int(cap)))
            .drop("__rk__")
        )
        return table._derive(out)
    if min_weight > 0:
        rank_cap = int(cap / min_weight) + 1
        df = (
            df.withColumn("__rk__", F.row_number().over(w))
            .where(F.col("__rk__") <= F.lit(rank_cap))
            .drop("__rk__")
        )
    # NULL weight = 0 (survives, consumes nothing) — without this one
    # NULL row would poison the running sum for every later row in its
    # group (the pack_sequences NULL-text lesson, ADVICE round 5).
    cum = F.sum(F.coalesce(F.col(weight_col), F.lit(0))).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("__cum__", cum)
        .where(F.col("__cum__") <= F.lit(cap))
        .drop("__cum__")
    )
    return table._derive(out)


def epoch_shuffle(
    table: Table,
    key_col: str,
    seed: str = "",
    n_shards: int = 64,
) -> Table:
    """Deterministic training-order shuffle: every row gets a stable
    pseudo-random (shard, shuffle_ord) from ``hash_bucket(key, seed)``,
    then the corpus is laid out shard-GROUPED — ``repartition(n,
    col("shard"))`` hash-partitions the shard VALUE, so each partition
    holds zero or more whole shards (shards never split, but two
    shards can share a partition and some partitions may be empty) —
    sorted by (shard, shuffle_ord) within each partition: the
    "globally shuffled, shard-sharded" order a training job reads
    sequentially. Re-running with the same seed is bit-identical;
    changing ``seed`` gives a fresh epoch permutation. To materialize a
    true one-directory-per-shard layout, export with
    ``df.write.partitionBy("shard")`` (in-partition order preserved);
    plain ``parquet_export`` preserves content and order but the
    file↔shard alignment is only the grouped one above.

    Scale shape (100 TB): shard = hash mod (no repartitionByRange — its
    sampled boundaries are nondeterministic), so the single shuffle is
    a plain hash exchange; per-shard sort happens inside each partition
    (sortWithinPartitions), never as a global orderBy. Hash sharding is
    balanced to ~1/sqrt(rows-per-shard) without any skew handling
    because the key is already uniform."""
    df = table._require_df()
    h = hash_bucket(F.col(key_col), salt=f"epoch:{seed}")
    out = (
        df.withColumn("shuffle_ord", h)
        .withColumn(
            "shard", F.pmod(F.col("shuffle_ord"), F.lit(int(n_shards))).cast("int")
        )
        .repartition(int(n_shards), F.col("shard"))
        .sortWithinPartitions("shard", "shuffle_ord", key_col)
    )
    return Table.from_df(out, name=f"{table.table_name}_epoch")
