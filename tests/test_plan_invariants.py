"""Plan-shape invariants across EVERY driver query: builds the physical
plan of each ``entry_queries.ALL_QUERIES`` entry (the parametrization
tracks the registry, so new queries are covered automatically; no
execution) and asserts the scale-killers are absent.

* CartesianProduct: never, anywhere.
* BroadcastNestedLoopJoin: only in the ANN queries whose DESIGN is
  "broadcast the tiny query/centroid side and score map-side" -- there the
  nested loop IS the intended all-candidates scoring pass, bounded by the
  broadcast side's size.
"""

from __future__ import annotations

import pytest

import mariadb_to_graylog_spark.entry_queries as eq

SF = "/root/testdata/sf0.001"

# crossJoin(broadcast(tiny)) is the intended shape here: every candidate
# scores against the handful of broadcast queries/centroids; resume_hwm
# broadcasts a ONE-ROW threshold scalar to every row
BNLJ_BY_DESIGN = {"knn_bruteforce", "knn_ivf", "resume_hwm", "knn_pq"}


@pytest.mark.parametrize("name", sorted(eq.ALL_QUERIES))
def test_no_quadratic_join_operators_in_plan(spark, name):
    df = eq.ALL_QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if name not in BNLJ_BY_DESIGN:
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_decontam_coverage_semi_join_is_broadcast(spark):
    """The vs-eval-set coverage/trim family must probe the eval hash set
    via a BROADCAST LeftSemi join (documents never shuffle on the gram
    key) -- the 100 TB-critical shape of the r6 semi-join cover path."""
    import re

    for name in ("decontaminate_coverage", "trim_contaminated"):
        df = eq.ALL_QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"BroadcastHashJoin .*LeftSemi", plan), name
        assert not re.search(r"SortMergeJoin .*LeftSemi", plan), name


def test_pack_sequences_single_hash_exchange(spark):
    """The packing path's scale contract: ONE hash exchange (the shard
    key) feeds the shard-local sort/window; no global sort, no second
    shuffle.  Holds for the raw operator and the mixture->packing
    composition (the sample filter rides a broadcast join)."""
    for name in ("pack_sequences", "training_manifest"):
        df = eq.ALL_QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "Exchange rangepartitioning" not in plan, name
