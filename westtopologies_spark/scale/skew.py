"""Skew mitigation utilities (SURVEY.md §4 / 100 TB design notes).

AQE's skew-join splitting (on in `session.get_spark`) handles most
sort-merge cases at runtime; these helpers cover the two shapes AQE
cannot fix:

- ``salted_distinct_count``: a grouped COUNT(DISTINCT x) whose group
  key is hot. Partial aggregation doesn't help distincts — every
  (key, x) pair still shuffles to one reducer. Salting splits each
  hot key into ``n_salts`` subkeys, distinct-counts per subkey over
  the DISJOINT value ranges (salt = hash(x) % n), then sums — exact,
  because the value space, not the row space, is partitioned.
- ``salted_join``: equi-join where one side has hot keys and the
  other side is too big to broadcast. The skewed side gets a random
  salt in [0, n); the other side is replicated n times; the join key
  becomes (key, salt). n-fold replication of the build side buys an
  n-fold split of the hot reduce partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT value) that never funnels a hot
    group into one reducer. Salt by the VALUE hash, so each subkey
    owns a disjoint slice of the value space and per-slice distinct
    counts add up exactly."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("_salt")
    per_slice = (
        df.select(*group_cols, value_col, salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.countDistinct(value_col).alias("_nd"))
    )
    return per_slice.groupBy(*group_cols).agg(F.sum("_nd").alias(out_col))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated ``n_salts`` times. Correct for row-preserving join
    types (inner/left) because each skewed row joins exactly one
    replica of its key's build rows."""
    salted = skewed.withColumn(
        "_salt", (F.rand(seed) * n_salts).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [on, "_salt"], how).drop("_salt")


def top_hot_keys(df: DataFrame, key_col: str | Column, k: int = 20) -> DataFrame:
    """Diagnostic: the k heaviest keys and their row counts — feed of
    the decision between broadcast, salting, and AQE-only."""
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"))
        .limit(k)
    )
