"""Bloom-filter semi-join: the classic shuffle-avoidance primitive
for large probe-side tables.

At cluster scale, joining a 100 TB fact table against a filtered
dimension normally shuffles the whole fact side. Building a Bloom
filter over the dimension keys and broadcasting it lets the fact scan
drop non-matching rows before the shuffle (Spark's own runtime-filter
feature, spark.sql.optimizer.runtime.bloomFilter.enabled, does this
inside Catalyst; this operator makes the mechanism explicit, typed,
and oracle-checkable).

The filter is represented as the distinct set of set bit positions —
semantically identical to a bit array, and expressible as the same
explode/distinct/join plan on both engines with pure int64
arithmetic (no engine-specific hash functions). A key is a "maybe
member" iff all K of its positions are present; no false negatives
by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M = 65_536  # filter size (positions)
BLOOM_P = 2_147_483_647  # Mersenne prime 2^31-1
# K = 3 independent affine hashes (multipliers are well-known odd
# 32-bit mixing constants; any fixed odd constants work)
BLOOM_A = (2_654_435_761, 2_246_822_519, 3_266_489_917)
BLOOM_B = (1_013_904_223, 374_761_393, 668_265_263)


def _positions(key: Column) -> list[Column]:
    return [
        ((key * F.lit(a) + F.lit(b)) % BLOOM_P) % BLOOM_M
        for a, b in zip(BLOOM_A, BLOOM_B)
    ]


def positions_sql(expr: str) -> list[str]:
    """The same K position hashes as SQL text (oracle generation)."""
    return [
        f"(({expr} * {a} + {b}) % {BLOOM_P}) % {BLOOM_M}"
        for a, b in zip(BLOOM_A, BLOOM_B)
    ]


def bloom_build(build: DataFrame, key: str) -> DataFrame:
    """Distinct set-bit positions for the build side's keys.

    Output is one small column ``p`` — at most ``K * n_build`` rows,
    deduplicated — meant to be broadcast to the probe side.
    """
    return build.select(
        F.explode(F.array(*_positions(F.col(key)))).alias("p")
    ).distinct()


def bloom_probe_summary(
    build: DataFrame, build_key: str, probe: DataFrame, probe_key: str
) -> DataFrame:
    """Probe every row of ``probe`` against the filter built from
    ``build`` and compare with the exact semi-join.

    Returns a 1-row accuracy summary (probed rows, flagged rows,
    true members, false positives) — exact integer arithmetic, so
    cross-engine parity is trivial. The flag is computed per distinct
    probe key (keys x K explode, broadcast-hash-joined against the
    position set, count==K), then joined back to rows.
    """
    pos = bloom_build(build, build_key)
    keys = probe.select(F.col(probe_key).alias("k")).distinct()
    kpos = keys.select(
        "k", F.explode(F.array(*_positions(F.col("k")))).alias("p")
    )
    flagged = (
        kpos.join(F.broadcast(pos), "p")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nhit"))
        .where(F.col("nhit") == len(BLOOM_A))
        .select("k")
    )
    members = keys.join(
        build.select(F.col(build_key).alias("bk")),
        F.col("k") == F.col("bk"),
        "left_semi",
    )
    fl = flagged.withColumn("is_flagged", F.lit(1))
    me = members.withColumn("is_member", F.lit(1))
    rows = (
        probe.select(F.col(probe_key).alias("k"))
        .join(fl, "k", "left")
        .join(me, "k", "left")
        .select(
            F.coalesce("is_flagged", F.lit(0)).alias("f"),
            F.coalesce("is_member", F.lit(0)).alias("m"),
        )
    )
    return rows.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("f").alias("n_flagged"),
        F.sum("m").alias("n_members"),
        F.sum(F.when((F.col("f") == 1) & (F.col("m") == 0), 1).otherwise(0)).alias(
            "n_false_pos"
        ),
    )
