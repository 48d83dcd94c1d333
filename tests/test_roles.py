"""Hand-computed fixture for the §2.7 role kernel.

Forest:
    1(A) ── 2(B) ── 3(A)
        └── 4(C)
    5(B)            (isolated root)
"""

from __future__ import annotations

import pytest

from westtopologies_spark.ops.roles import (
    assign_roles,
    role_features,
    tercile_levels,
    with_root_ids,
)


@pytest.fixture(scope="module")
def forest(spark):
    rows = [
        (1, None, "A"),
        (2, 1, "B"),
        (3, 2, "A"),
        (4, 1, "C"),
        (5, None, "B"),
    ]
    return spark.createDataFrame(rows, "tweet_id long, parent_id long, author_id string")


def test_root_ids(forest):
    roots = {r["tweet_id"]: r["root_id"] for r in with_root_ids(forest).collect()}
    assert roots == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5}


def test_features_hand_computed(forest):
    feats = {r["user_id"]: r.asDict() for r in role_features(forest).collect()}
    a, b, c = feats["A"], feats["B"], feats["C"]

    assert (a["post_count"], a["replied_posts"], a["n_replying_users"]) == (2, 1, 2)
    assert (a["n_neighbours"], a["n_bidir_neighbours"], a["bidir_threads"]) == (2, 0, 0)
    assert a["in_degree_ratio"] == pytest.approx(2 / 3)
    assert a["posts_reply_ratio"] == pytest.approx(0.5)
    assert a["avg_posts_per_thread"] == pytest.approx(4.0)
    assert a["stddev_posts_per_thread"] == 0.0  # single tree

    assert (b["post_count"], b["replied_posts"], b["n_replying_users"]) == (2, 1, 1)
    # B's contribution 2 replied to A, and A replied back -> bidirectional
    assert (b["n_neighbours"], b["n_bidir_neighbours"], b["bidir_threads"]) == (1, 1, 1)
    assert b["bidir_neighbour_ratio"] == pytest.approx(1.0)
    assert b["bidir_thread_ratio"] == pytest.approx(0.5)
    assert b["avg_posts_per_thread"] == pytest.approx(2.5)  # trees of size 4 and 1
    assert b["stddev_posts_per_thread"] == pytest.approx((4.5) ** 0.5)

    assert (c["post_count"], c["replied_posts"], c["n_neighbours"]) == (1, 0, 0)
    assert c["in_degree_ratio"] == 0.0
    assert c["bidir_neighbour_ratio"] == 0.0  # 0/0 -> 0


def test_bug_compatible_mode(forest):
    leveled = tercile_levels(role_features(forest))
    roles = assign_roles(leveled, bug_compatible=True).select("role").distinct().collect()
    assert [r["role"] for r in roles] == ["<None>"]
