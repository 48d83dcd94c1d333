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

Scale notes: every step is a keyed aggregation or a self-join on
tweet_id/parent_id — shuffle-partitioned by Catalyst, no driver
state. Root discovery is an iterative bounded-depth join (tree depth
is bounded in practice; the reference recursion would stack-overflow
otherwise). Tercile training is per-window; a window's user
population is bounded, so exact sort-based boundaries are safe.
"""

from __future__ import annotations

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


def with_root_ids(nodes: DataFrame, max_depth: int = 12) -> DataFrame:
    """Attach root_id (discussion-tree id) to each node by following
    parent pointers to the root — bounded-depth pointer jumping.

    The reference walks the recursive `replies` structure
    (StormCommunityFactory#parseCommunity); flat edges need the walk
    made explicit. ``max_depth`` iterations of a left join resolve
    forests up to that depth; each step is a hash join on the id —
    distributed, no driver recursion.
    """
    parents = nodes.select(
        F.col("tweet_id").alias("_anc_id"), F.col("parent_id").alias("_anc_parent")
    )
    cur = nodes.select("tweet_id", F.coalesce("parent_id", "tweet_id").alias("_anc"))
    for _ in range(max_depth):
        cur = (
            cur.join(parents, cur._anc == parents._anc_id, "left")
            .withColumn("_anc", F.coalesce("_anc_parent", "_anc"))
            .drop("_anc_id", "_anc_parent")
        )
    return nodes.join(cur.withColumnRenamed("_anc", "root_id"), "tweet_id")


def role_features(nodes: DataFrame, min_limit: int = 1) -> DataFrame:
    """Per-user behaviour features over one community window.

    ``nodes``: (tweet_id, parent_id, author_id[, root_id]); if
    root_id is absent it is derived via :func:`with_root_ids`.
    Mirrors CommunityAnalysis#analyseUserFeatures (SURVEY.md §2.7):
    question/answer/comment counts are structurally zero in the
    Twitter path (DiscussionNode.type never set), so
    thread_initiation_ratio is 0 for every user — kept as a real
    column because the tercile/rule machinery consumes it.
    """
    if "root_id" not in nodes.columns:
        nodes = with_root_ids(nodes)
    nodes = nodes.filter(F.col("author_id").isNotNull())

    # parent author per node
    par = nodes.select(
        F.col("tweet_id").alias("_p_id"), F.col("author_id").alias("parent_author")
    )
    # (contribution c of user u) x (direct child): the unit the
    # reference iterates per contribution-with-children.
    child = nodes.select(
        F.col("parent_id").alias("_c_id"), F.col("author_id").alias("child_author")
    )
    contrib = nodes.select(
        F.col("tweet_id").alias("_c_id"),
        F.col("author_id").alias("user_id"),
        F.col("parent_id").alias("_c_parent"),
    )
    pairs = (
        contrib.join(child, "_c_id")
        .join(par, contrib._c_parent == par._p_id, "left")
        .select("_c_id", "user_id", "child_author", "parent_author")
    )

    replied = pairs.groupBy("user_id").agg(
        F.countDistinct("_c_id").alias("replied_posts"),
        F.countDistinct("child_author").alias("n_replying_users"),
    )
    neighbours = (
        pairs.select("user_id", F.col("child_author").alias("nb"))
        .unionByName(
            pairs.filter(F.col("parent_author").isNotNull()).select(
                "user_id", F.col("parent_author").alias("nb")
            )
        )
        .groupBy("user_id")
        .agg(F.countDistinct("nb").alias("n_neighbours"))
    )
    bidir = (
        pairs.filter(F.col("child_author") == F.col("parent_author"))
        .groupBy("user_id")
        .agg(
            F.countDistinct("child_author").alias("n_bidir_neighbours"),
            F.countDistinct("_c_id").alias("bidir_threads"),
        )
    )

    posts = nodes.groupBy(F.col("author_id").alias("user_id")).agg(
        F.count(F.lit(1)).alias("post_count")
    )

    tree_sizes = nodes.groupBy("root_id").agg(F.count(F.lit(1)).alias("tree_size"))
    user_trees = (
        nodes.select(F.col("author_id").alias("user_id"), "root_id")
        .distinct()
        .join(tree_sizes, "root_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_trees"),
            F.sum("tree_size").alias("sum_tree_sizes"),
            F.sum(F.col("tree_size") * F.col("tree_size")).alias("sum_tree_sizes_sq"),
        )
    )

    n_community_users = nodes.select(F.countDistinct("author_id").alias("n_community_users"))

    feats = (
        posts.join(replied, "user_id", "left")
        .join(neighbours, "user_id", "left")
        .join(bidir, "user_id", "left")
        .join(user_trees, "user_id", "left")
        .crossJoin(F.broadcast(n_community_users))
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
        "user_id",
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


def tercile_levels(features: DataFrame, feature_cols: tuple[str, ...] = LEVEL_FEATURES) -> DataFrame:
    """Attach `<feature>_level` (low/med/high) columns using exact
    tercile boundaries trained on the current population (A4,
    Boundaries#train/#getLevel: `<=` -> low/med, else high).
    """
    aggs = []
    for c in feature_cols:
        vals = F.sort_array(F.collect_list(F.col(c)))
        n = F.size(vals)
        lo = F.floor(n / 3).cast("int")
        hi = F.floor(n * 2 / 3).cast("int")
        aggs.append(
            ((F.element_at(vals, lo + 1) + F.element_at(vals, lo + 2)) / 2.0).alias(f"_{c}_lm")
        )
        aggs.append(
            ((F.element_at(vals, hi + 1) + F.element_at(vals, hi + 2)) / 2.0).alias(f"_{c}_mh")
        )
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
    expr = F.lit("<None>")
    # Build when-cascade in reverse: evaluating the LAST rule first
    # implements last-match-wins.
    role_expr = None
    for role, conds in reversed(ROLE_RULES):
        cond = None
        for feat, lvl in conds.items():
            c = F.col(f"{feat}_level") == lvl
            cond = c if cond is None else (cond & c)
        role_expr = F.when(cond, F.lit(role)) if role_expr is None else role_expr.when(cond, F.lit(role))
    return leveled.withColumn("role", role_expr.otherwise(expr))
