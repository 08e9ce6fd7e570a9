"""Deduplication operators for large-scale corpus curation.

Net-new over the reference (north-star requirement): exact dedup,
MinHash+LSH near-dup, SimHash, n-gram Jaccard, and embedding-cosine
near-dup, each as a composable DataFrame plan.

Scale design (100 TB):
- shingling/minhashing are *narrow* higher-order-function projections
  (no explode, no shuffle) — each row computes its own sketch in
  whole-stage codegen;
- LSH banding is the only widening step: explode to (band_key, id) then
  a self-equi-join per bucket — the classic shuffle-once candidate
  generation; hot buckets are bounded by band width choice and AQE skew
  handling;
- exact pairwise Jaccard/cosine exist as the small-N verification path;
  candidate generation at scale always goes through LSH first.
- hashes are md5-based (not Spark's murmur3) so results are engine-
  portable and oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..table import Table

TOKENIZE = r"\s+"


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.trim(F.col(text_col)), TOKENIZE), lambda x: x != F.lit("")
    )


def _shingles(text_col: str, n: int) -> Column:
    """Distinct word n-gram shingles, computed without a shuffle."""
    toks = _tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def exact_dedup(table: Table, key_cols: list[str], id_col: str) -> Table:
    """Keep one representative (min id) per exact key — hash groupBy."""
    df = table.df
    out = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return Table.from_df(out.select(id_col, *key_cols), name=f"{table.table_name}_dedup")


def fingerprint_dedup(table: Table, text_col: str, id_col: str) -> Table:
    """Dedup on a normalized content fingerprint (md5 of lowercased,
    whitespace-collapsed text) — catches trivial reformattings."""
    df = table.df
    fp = F.md5(F.array_join(F.transform(_tokens(text_col), F.lower), " "))
    out = (
        df.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )
    return Table.from_df(out, name=f"{table.table_name}_fp_dedup")


def minhash_signature(
    text_col: str, n: int = 3, num_hashes: int = 8
) -> list[Column]:
    """MinHash sketch: per-row array_min over md5-salted shingle hashes.

    Pure projection — every signature column is computed inside
    whole-stage codegen with no explode and no shuffle.
    """
    sh = _shingles(text_col, n)

    def mh(i: int) -> Column:
        # NB: close over the salt Column — extra lambda params (even
        # defaulted) would be bound to lambda variables by Spark
        salt = F.lit(f":{i}")
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(s, salt)))
        ).alias(f"mh{i}")

    return [mh(i) for i in range(num_hashes)]


def minhash_lsh_pairs(
    table: Table,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> Table:
    """Candidate near-dup pairs via MinHash + LSH banding.

    Two docs are candidates iff all minhashes within at least one band
    agree. Returns distinct (id1, id2) with id1 < id2.
    """
    if num_hashes % band_size != 0:
        raise ValueError("num_hashes must be divisible by band_size")
    sig = table.df.select(F.col(id_col), *minhash_signature(text_col, n, num_hashes))
    n_bands = num_hashes // band_size
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                )
            )
            for b in range(n_bands)
        ]
    )
    # attach band ordinal so identical keys in different bands don't collide
    banded = sig.select(
        F.col(id_col), F.posexplode(band_keys).alias("band", "band_key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        .distinct()
    )
    return Table.from_df(pairs, name=f"{table.table_name}_minhash_pairs")


def ngram_jaccard_pairs(
    table: Table,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> Table:
    """Exact pairwise n-gram Jaccard similarity ≥ threshold.

    Inverted-index formulation: explode distinct shingles, self-join on
    shingle to count intersections, derive |A∪B| from per-doc sizes.
    Quadratic in docs sharing a shingle — the verification path after
    LSH candidate generation at scale.
    """
    df = table.df
    sh = df.select(
        F.col(id_col), F.explode(_shingles(text_col, n)).alias("s")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.s") == F.col("b.s"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col(id_col).alias("id2"), F.col("sz").alias("sz2"))
    jac = (
        inter.join(sa, on="id1")
        .join(sb, on="id2")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))
    )
    return Table.from_df(jac, name=f"{table.table_name}_jaccard_pairs")


def simhash(text_col: str, bits: int = 32) -> Column:
    """SimHash fingerprint from md5-derived token hashes.

    bit_i(doc) = sign of sum over tokens of (+1 if bit_i(hash(tok)) else -1).
    Narrow projection, engine-portable (md5 + hex → integer).
    """
    toks = _tokens(text_col)
    tok_hash = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    def votes(mask: Column) -> Column:
        return F.aggregate(
            tok_hash,
            F.lit(0).cast("long"),
            lambda a, h: a
            + F.when(h.bitwiseAND(mask) != 0, F.lit(1)).otherwise(F.lit(-1)),
        )

    acc = F.lit(0).cast("long")
    for i in range(bits):
        bit = 1 << i
        acc = acc + F.when(votes(F.lit(bit)) > 0, F.lit(bit)).otherwise(F.lit(0))
    return acc


def simhash_dedup_pairs(
    table: Table,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> Table:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the fingerprint into ``n_blocks`` blocks;
    any pair within distance ``max_hamming < n_blocks`` agrees on at
    least one block — equi-join per block, then exact Hamming filter
    via bit_count(xor). Scale path: one shuffle per block, no cross join.
    """
    block_width = bits // n_blocks
    sh = table.df.select(F.col(id_col), simhash(text_col, bits).alias("sh"))
    blocks = F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.shiftrightunsigned(F.col("sh"), b * block_width)
                .bitwiseAND(F.lit((1 << block_width) - 1))
                .cast("string"),
            )
            for b in range(n_blocks)
        ]
    )
    banded = sh.select(F.col(id_col), F.col("sh"), F.explode(blocks).alias("blk"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.blk") == F.col("b.blk"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            F.bit_count(
                F.col("a.sh").bitwiseXOR(F.col("b.sh"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .distinct()
    )
    return Table.from_df(pairs, name=f"{table.table_name}_simhash_pairs")


def embedding_dup_pairs(
    table: Table,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
) -> Table:
    """Near-dup pairs by embedding cosine ≥ threshold (exact pairwise).

    The small-N verification path; at corpus scale generate candidates
    with ``similarity.lsh_buckets`` first.
    """
    from .similarity import cosine_expr

    df = table.df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    a = df.alias("a")
    b = df.alias("b")
    out = (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            F.round(
                cosine_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )
    return Table.from_df(out, name=f"{table.table_name}_embedding_pairs")
