"""Role-analysis kernel (SURVEY.md §2.7).

Recovered from bytecode of the reference's binary analytics jar
(reveal-interaction-1.0.jar!CommunityAnalysis#analyseUserFeatures,
RoleAssociation#process/#assignRole; invoked from
roleAnalysisTopology/.../bolts/RoleAnalysisBolt.java:96 with
minLimit=1). Input is the flat discussion forest of one window as a
node table (tweet_id, parent_id, author_id); the reference's
recursive Community structure maps to pure DataFrame aggregates:

- features: per-user counts/ratios/avg/sample-stddev,
- levels: exact per-window tercile boundaries (Boundaries#train),
- roles: the 8-rule cascade, last match wins — plus the
  bug-compatible mode where every user ends as "<None>" (the
  decompiled assignRole unconditionally overwrites the role at the
  end; SURVEY.md §2.7 replication note).

Every function takes an optional ``community_col``: when set, ALL
aggregations, self-joins and tercile boundaries are additionally
keyed by that column, so thousands of windows are processed in ONE
distributed plan — no driver-side loop over windows (the reference
processes one window at a time on a single executor; SURVEY.md §4.1).

Scale notes: every step is a keyed aggregation or a self-join on
(community, tweet_id/parent_id) — shuffle-partitioned by Catalyst.
Root discovery is an iterative bounded-depth join (tree depth is
bounded in practice). Tercile training is per-window; a window's
user population is bounded, so exact sort-based boundaries are safe.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The 7 rule features, in the reference's order.
LEVEL_FEATURES = (
    "in_degree_ratio",
    "posts_reply_ratio",
    "thread_initiation_ratio",
    "bidir_neighbour_ratio",
    "bidir_thread_ratio",
    "avg_posts_per_thread",
    "stddev_posts_per_thread",
)

ROLE_RULES: tuple[tuple[str, dict[str, str]], ...] = (
    ("Elitist", {"in_degree_ratio": "low", "bidir_thread_ratio": "high", "bidir_neighbour_ratio": "low"}),
    ("Grunt", {"bidir_thread_ratio": "med", "bidir_neighbour_ratio": "med", "avg_posts_per_thread": "low", "stddev_posts_per_thread": "low"}),
    ("Joining Conversationalist", {"thread_initiation_ratio": "low", "avg_posts_per_thread": "high", "stddev_posts_per_thread": "high"}),
    ("Popular Initiator", {"in_degree_ratio": "high", "avg_posts_per_thread": "high"}),
    ("Popular Participant", {"in_degree_ratio": "high", "thread_initiation_ratio": "low", "avg_posts_per_thread": "med", "stddev_posts_per_thread": "med"}),
    ("Supporter", {"in_degree_ratio": "med", "bidir_thread_ratio": "med", "bidir_neighbour_ratio": "med"}),
    ("Taciturn", {"bidir_thread_ratio": "low", "bidir_neighbour_ratio": "low", "avg_posts_per_thread": "low", "stddev_posts_per_thread": "low"}),
    ("Ignored", {"posts_reply_ratio": "low"}),
)


def _keys(community_col: str | None, *cols: str) -> list[str]:
    return ([community_col] if community_col else []) + list(cols)


def with_root_ids(
    nodes: DataFrame,
    max_depth: int = 16,
    community_col: str | None = None,
    persist: bool = True,
) -> DataFrame:
    """Attach root_id (discussion-tree id) to each node by following
    parent pointers to the root — POINTER DOUBLING, not a linear
    walk: after k self-joins every node knows its 2^k-th ancestor,
    so forests of depth ``max_depth`` resolve in ceil(log2(depth))
    joins instead of ``depth``. At 100 TB that's the difference
    between 4 shuffles and 16+ on the critical path.

    The reference walks the recursive `replies` structure
    (StormCommunityFactory#parseCommunity); flat edges need the walk
    made explicit. Each step is a hash join on the id — distributed,
    no driver recursion.

    ``persist`` caches each doubling step (the iterative-graph
    pattern, cf. GraphX/Pregel): the self-join otherwise doubles the
    PLAN subtree per pass — 2^k copies of the scan — and every
    downstream consumer would re-expand it. The cached mapping is 3
    narrow columns, negligible next to the data it indexes.
    """
    join_keys = _keys(community_col)
    cur = nodes.select(
        *join_keys, "tweet_id", F.coalesce("parent_id", "tweet_id").alias("_anc")
    )
    steps = max(1, math.ceil(math.log2(max(max_depth, 2))))
    for i in range(steps):
        # fresh aliases each iteration: aliasing mints new attribute
        # ids, avoiding Spark's ambiguous-self-join trap
        nxt = cur.select(
            *[F.col(k).alias(f"_pk{i}_{j}") for j, k in enumerate(join_keys)],
            F.col("tweet_id").alias(f"_pid{i}"),
            F.col("_anc").alias(f"_pa{i}"),
        )
        cond = [cur["_anc"] == nxt[f"_pid{i}"]] + [
            cur[k].eqNullSafe(nxt[f"_pk{i}_{j}"]) for j, k in enumerate(join_keys)
        ]
        cur = cur.join(nxt, cond, "left").select(
            *[cur[k] for k in join_keys],
            cur["tweet_id"],
            # anc(anc(x)): doubles the resolved distance every pass;
            # roots self-map so converged pointers stay fixed
            F.coalesce(nxt[f"_pa{i}"], cur["_anc"]).alias("_anc"),
        )
        if persist:
            cur = cur.persist()
    return nodes.join(
        cur.withColumnRenamed("_anc", "root_id"), _keys(community_col, "tweet_id")
    )


def role_features(
    nodes: DataFrame,
    min_limit: int = 1,
    community_col: str | None = None,
    max_depth: int = 16,
    truncate: bool = False,
) -> DataFrame:
    """Per-user behaviour features over one community window (or over
    every window at once when ``community_col`` is given).

    ``nodes``: (tweet_id, parent_id, author_id[, root_id]); if
    root_id is absent it is derived via :func:`with_root_ids`.
    Mirrors CommunityAnalysis#analyseUserFeatures (SURVEY.md §2.7):
    question/answer/comment counts are structurally zero in the
    Twitter path (DiscussionNode.type never set), so
    thread_initiation_ratio is 0 for every user — kept as a real
    column because the tercile/rule machinery consumes it.
    """
    if "root_id" not in nodes.columns:
        nodes = with_root_ids(nodes, max_depth=max_depth, community_col=community_col)
    # ~6 aggregation branches below scan the annotated node table;
    # persist it once instead of re-expanding the root-walk per branch.
    # ``truncate=True`` (r8, guide §3.3 "planning time itself can
    # become the bottleneck") swaps the persist for a localCheckpoint:
    # a profile of a3_role_assignment showed the entry is COMPILE-
    # bound, not execution-bound (5.7s cold / 3.0s plan-warm / 0.3s
    # plan-identical re-run at sf0.1) — persist() keeps the full
    # root-walk lineage in the logical plan, so analysis/optimization
    # re-walks it once per branch; the checkpoint makes each branch's
    # plan a leaf scan.  Off by default: the batch entries opt in,
    # the windowed pipeline keeps lazy persist semantics.
    nodes = nodes.filter(F.col("author_id").isNotNull())
    nodes = nodes.localCheckpoint() if truncate else nodes.persist()
    ck = _keys(community_col)

    # parent author per node
    par = nodes.select(
        *ck, F.col("tweet_id").alias("_p_id"), F.col("author_id").alias("parent_author")
    )
    child = nodes.select(
        *ck, F.col("parent_id").alias("_c_id"), F.col("author_id").alias("child_author")
    )
    contrib = nodes.select(
        *ck,
        F.col("tweet_id").alias("_c_id"),
        F.col("author_id").alias("user_id"),
        F.col("parent_id").alias("_c_parent"),
    )
    pairs = (
        contrib.join(child, _keys(community_col, "_c_id"))
        .join(
            par,
            [contrib._c_parent == par._p_id] + [contrib[k] == par[k] for k in ck],
            "left",
        )
        .select(*[contrib[k] for k in ck], "_c_id", "user_id", "child_author", "parent_author")
    )

    uk = _keys(community_col, "user_id")
    # ONE shuffled aggregation for replied/neighbour/bidir stats
    # (conditional distinct-aggs; collect_set for the union-set size)
    # instead of three separate groupBys over the same pair frame —
    # at scale that is 1 shuffle of `pairs` rather than 3.
    bidir_cond = F.col("child_author") == F.col("parent_author")
    pair_stats = pairs.groupBy(*uk).agg(
        F.countDistinct("_c_id").alias("replied_posts"),
        F.countDistinct("child_author").alias("n_replying_users"),
        F.size(
            F.array_union(
                F.collect_set("child_author"), F.collect_set("parent_author")
            )
        ).alias("n_neighbours"),
        F.countDistinct(F.when(bidir_cond, F.col("child_author"))).alias(
            "n_bidir_neighbours"
        ),
        F.countDistinct(F.when(bidir_cond, F.col("_c_id"))).alias("bidir_threads"),
    )

    posts = nodes.groupBy(*ck, F.col("author_id").alias("user_id")).agg(
        F.count(F.lit(1)).alias("post_count")
    )

    tree_sizes = nodes.groupBy(*_keys(community_col, "root_id")).agg(
        F.count(F.lit(1)).alias("tree_size")
    )
    user_trees = (
        nodes.select(*ck, F.col("author_id").alias("user_id"), "root_id")
        .distinct()
        .join(tree_sizes, _keys(community_col, "root_id"))
        .groupBy(*uk)
        .agg(
            F.count(F.lit(1)).alias("n_trees"),
            F.sum("tree_size").alias("sum_tree_sizes"),
            F.sum(F.col("tree_size") * F.col("tree_size")).alias("sum_tree_sizes_sq"),
        )
    )

    if community_col:
        n_users = nodes.groupBy(community_col).agg(
            F.countDistinct("author_id").alias("n_community_users")
        )
        feats = posts.join(F.broadcast(n_users), community_col)
    else:
        n_users = nodes.select(F.countDistinct("author_id").alias("n_community_users"))
        feats = posts.crossJoin(F.broadcast(n_users))

    feats = (
        feats.join(pair_stats, uk, "left")
        .join(user_trees, uk, "left")
        .fillna(
            0,
            subset=[
                "replied_posts",
                "n_replying_users",
                "n_neighbours",
                "n_bidir_neighbours",
                "bidir_threads",
                "n_trees",
                "sum_tree_sizes",
                "sum_tree_sizes_sq",
            ],
        )
        .filter(F.col("post_count") >= min_limit)
    )

    def ratio(num, den):
        return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))

    n = F.col("n_trees")
    ssum = F.col("sum_tree_sizes")
    ssq = F.col("sum_tree_sizes_sq")
    return feats.select(
        *uk,
        "post_count",
        "replied_posts",
        "n_replying_users",
        "n_neighbours",
        "n_bidir_neighbours",
        "bidir_threads",
        ratio(F.col("n_replying_users"), F.col("n_community_users")).alias("in_degree_ratio"),
        ratio(F.col("replied_posts"), F.col("post_count")).alias("posts_reply_ratio"),
        F.lit(0.0).alias("thread_initiation_ratio"),
        ratio(F.col("n_bidir_neighbours"), F.col("n_neighbours")).alias("bidir_neighbour_ratio"),
        ratio(F.col("bidir_threads"), F.col("post_count")).alias("bidir_thread_ratio"),
        ratio(ssum, n).alias("avg_posts_per_thread"),
        F.when(
            n >= 2,
            F.sqrt((n * ssq - ssum * ssum).cast("double") / (n * (n - F.lit(1))).cast("double")),
        )
        .otherwise(F.lit(0.0))
        .alias("stddev_posts_per_thread"),
    )


def tercile_levels(
    features: DataFrame,
    feature_cols: tuple[str, ...] = LEVEL_FEATURES,
    community_col: str | None = None,
) -> DataFrame:
    """Attach `<feature>_level` (low/med/high) columns using exact
    tercile boundaries trained on the current population — per
    community when ``community_col`` is given (A4, Boundaries#train/
    #getLevel: `<=` -> low/med, else high).
    """
    # the feature frame (pointer-doubling root walk + fused aggs) feeds
    # both the boundary aggregation and the join-back; without a pin
    # Spark computes it twice — at any scale the trained-population
    # scan is materialized once
    features = features.persist()
    aggs = []
    for c in feature_cols:
        vals = F.sort_array(F.collect_list(F.col(c)))
        n = F.size(vals)
        lo = F.floor(n / 3).cast("int")
        hi = F.floor(n * 2 / 3).cast("int")
        # try_element_at: populations smaller than ~4 overflow the
        # boundary index (the reference's Java would throw); NULL
        # boundary degrades to level 'high' rather than failing.
        aggs.append(
            ((F.try_element_at(vals, lo + 1) + F.try_element_at(vals, lo + 2)) / 2.0).alias(
                f"_{c}_lm"
            )
        )
        aggs.append(
            ((F.try_element_at(vals, hi + 1) + F.try_element_at(vals, hi + 2)) / 2.0).alias(
                f"_{c}_mh"
            )
        )
    if community_col:
        bounds = features.groupBy(community_col).agg(*aggs)
        out = features.join(F.broadcast(bounds), community_col)
    else:
        bounds = features.agg(*aggs)
        out = features.crossJoin(F.broadcast(bounds))
    for c in feature_cols:
        out = out.withColumn(
            f"{c}_level",
            F.when(F.col(c) <= F.col(f"_{c}_lm"), F.lit("low"))
            .when(F.col(c) <= F.col(f"_{c}_mh"), F.lit("med"))
            .otherwise(F.lit("high")),
        )
    return out.drop(*[f"_{c}_lm" for c in feature_cols], *[f"_{c}_mh" for c in feature_cols])


def assign_roles(leveled: DataFrame, bug_compatible: bool = False) -> DataFrame:
    """Apply the 8 role rules; later rules overwrite earlier (the
    bytecode chain is independent ifs, last match wins), final
    fallback "<None>".

    ``bug_compatible=True`` reproduces the literal compiled
    behaviour — role = "<None>" assigned unconditionally at the end
    (RoleAssociation#assignRole; see SURVEY.md §2.7).
    """
    if bug_compatible:
        return leveled.withColumn("role", F.lit("<None>"))
    # Build when-cascade in reverse: evaluating the LAST rule first
    # implements last-match-wins.
    role_expr = None
    for role, conds in reversed(ROLE_RULES):
        cond = None
        for feat, lvl in conds.items():
            c = F.col(f"{feat}_level") == lvl
            cond = c if cond is None else (cond & c)
        role_expr = (
            F.when(cond, F.lit(role)) if role_expr is None else role_expr.when(cond, F.lit(role))
        )
    return leveled.withColumn("role", role_expr.otherwise(F.lit("<None>")))
