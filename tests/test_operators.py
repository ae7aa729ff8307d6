"""Unit tests for the operator library (operators/*) on constructed frames.

Oracle-gate coverage for the same operators lives in test_queries_oracle.py;
these tests pin the semantic corners (strictness, ties, empties, determinism)
on inputs small enough to reason about by hand.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.operators.any_join import any_join, anti_join, semi_join
from clickhouse_23_3_19_32_lts_spark.operators.arrayjoin import array_join
from clickhouse_23_3_19_32_lts_spark.operators.asof_join import asof_join
from clickhouse_23_3_19_32_lts_spark.operators.limit_by import limit_by
from clickhouse_23_3_19_32_lts_spark.operators.sampling import sample_deterministic
from clickhouse_23_3_19_32_lts_spark.operators.totals import with_totals
from clickhouse_23_3_19_32_lts_spark.operators.with_fill import with_fill


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", t=10, lv="L10"),
            Row(k="a", t=20, lv="L20"),
            Row(k="a", t=30, lv="L30"),
            Row(k="b", t=15, lv="L15"),
            Row(k="c", t=5, lv="L5"),  # no right rows for c
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", t=10, rv="R10"),
            Row(k="a", t=25, rv="R25"),
            Row(k="b", t=15, rv="R15"),
            Row(k="b", t=99, rv="R99"),
        ]
    )
    return left, right


def _asof_map(df):
    return {(r["k"], r["t"]): r["rv"] for r in df.collect()}


def test_asof_backward_inclusive(asof_frames):
    left, right = asof_frames
    got = _asof_map(asof_join(left, right, on="t", by=["k"], strictness="<=", right_prefix="r_"))
    assert got == {
        ("a", 10): "R10",  # equal ts matches inclusively
        ("a", 20): "R10",
        ("a", 30): "R25",
        ("b", 15): "R15",
        ("c", 5): None,  # LEFT keeps unmatched
    }


def test_asof_backward_strict(asof_frames):
    left, right = asof_frames
    got = _asof_map(asof_join(left, right, on="t", by=["k"], strictness="<", right_prefix="r_"))
    assert got == {
        ("a", 10): None,  # strict: equal ts excluded
        ("a", 20): "R10",
        ("a", 30): "R25",
        ("b", 15): None,
        ("c", 5): None,
    }


def test_asof_forward_inclusive(asof_frames):
    left, right = asof_frames
    got = _asof_map(asof_join(left, right, on="t", by=["k"], strictness=">=", right_prefix="r_"))
    assert got == {
        ("a", 10): "R10",
        ("a", 20): "R25",
        ("a", 30): None,
        ("b", 15): "R15",
        ("c", 5): None,
    }


def test_asof_forward_strict(asof_frames):
    left, right = asof_frames
    got = _asof_map(asof_join(left, right, on="t", by=["k"], strictness=">", right_prefix="r_"))
    assert got == {
        ("a", 10): "R25",
        ("a", 20): "R25",
        ("a", 30): None,
        ("b", 15): "R99",
        ("c", 5): None,
    }


def test_asof_inner_drops_unmatched(asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on="t", by=["k"], strictness="<=", how="inner", right_prefix="r_")
    keys = {(r["k"], r["t"]) for r in out.collect()}
    assert ("c", 5) not in keys and ("a", 20) in keys


def test_asof_different_on_names(spark):
    left = spark.createDataFrame([Row(k="a", lt=20)])
    right = spark.createDataFrame([Row(k="a", rt=10, rv="R")])
    out = asof_join(left, right, on=("lt", "rt"), by=["k"]).collect()
    assert out[0]["rv"] == "R"


def test_any_join_picks_one_deterministic(spark):
    left = spark.createDataFrame([Row(k=1, l="x"), Row(k=2, l="y")])
    right = spark.createDataFrame(
        [Row(k=1, v="b"), Row(k=1, v="a"), Row(k=1, v="c"), Row(k=3, v="z")]
    )
    out = any_join(left, right, on=["k"], how="left").collect()
    got = {r["k"]: r["v"] for r in out}
    assert got == {1: "a", 2: None}  # min by payload order; left row kept
    assert len(out) == 2  # no row explosion on duplicate keys


def test_semi_anti(spark):
    left = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=3)])
    right = spark.createDataFrame([Row(k=2), Row(k=2)])
    assert {r["k"] for r in semi_join(left, right, ["k"]).collect()} == {2}
    assert {r["k"] for r in anti_join(left, right, ["k"]).collect()} == {1, 3}


def test_with_fill_numeric(spark):
    df = spark.createDataFrame([Row(x=1, v=10.0), Row(x=4, v=40.0)])
    out = with_fill(df, "x").collect()
    assert [r["x"] for r in out] == [1, 2, 3, 4]
    assert [r["v"] for r in out] == [10.0, None, None, 40.0]


def test_with_fill_from_to_step(spark):
    df = spark.createDataFrame([Row(x=2, v=1.0)])
    out = with_fill(df, "x", from_=0, to=8, step=2).collect()
    assert [r["x"] for r in out] == [0, 2, 4, 6]  # TO is exclusive


def test_with_fill_interpolate_forward(spark):
    df = spark.createDataFrame([Row(x=1, v=10.0), Row(x=4, v=40.0)])
    out = with_fill(df, "x", interpolate=["v"]).collect()
    assert [r["v"] for r in out] == [10.0, 10.0, 10.0, 40.0]


def test_with_fill_partitioned_timestamps(spark):
    df = spark.createDataFrame(
        [
            Row(g="a", d=ts("2024-01-01"), n=1),
            Row(g="a", d=ts("2024-01-03"), n=3),
            Row(g="b", d=ts("2024-01-05"), n=5),
        ]
    )
    out = with_fill(df, "d", step=86400, partition_by=["g"]).collect()
    got = [(r["g"], r["d"].day, r["n"]) for r in out]
    assert got == [("a", 1, 1), ("a", 2, None), ("a", 3, 3), ("b", 5, 5)]


def test_with_totals(spark):
    df = spark.createDataFrame([Row(g="x", v=1), Row(g="x", v=2), Row(g="y", v=3)])
    out = with_totals(df, ["g"], [F.sum("v").alias("s")]).collect()
    got = {r["g"]: r["s"] for r in out}
    assert got == {"x": 3, "y": 3, None: 6}


def test_with_totals_having_keeps_totals_row(spark):
    df = spark.createDataFrame([Row(g="x", v=1), Row(g="y", v=30)])
    out = with_totals(df, ["g"], [F.sum("v").alias("s")], having=F.col("s") > 10).collect()
    got = {r["g"]: r["s"] for r in out}
    assert got == {"y": 30, None: 31}  # x filtered; totals row survives


def test_sample_deterministic_and_subset(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s10a = sample_deterministic(li, 0.1, "l_orderkey")
    s10b = sample_deterministic(li, 0.1, "l_orderkey")
    s20 = sample_deterministic(li, 0.2, "l_orderkey")
    n10, n10b, n20, total = s10a.count(), s10b.count(), s20.count(), li.count()
    assert n10 == n10b  # same subset every run
    assert 0 < n10 < n20 < total
    # subset property: every 10%-sample orderkey is in the 20% sample
    only10 = s10a.select("l_orderkey").exceptAll(s20.select("l_orderkey"))
    assert only10.count() == 0


def test_array_join_single_and_left(spark):
    df = spark.createDataFrame([Row(id=1, a=[10, 20]), Row(id=2, a=[])])
    inner = array_join(df, ["a"]).collect()
    assert sorted((r["id"], r["a"]) for r in inner) == [(1, 10), (1, 20)]
    outer = array_join(df, ["a"], left=True).collect()
    assert sorted((r["id"], r["a"]) for r in outer) == [(1, 10), (1, 20), (2, None)]


def test_array_join_multi_zips(spark):
    df = spark.createDataFrame([Row(id=1, a=[1, 2], b=["x", "y", "z"])])
    out = array_join(df, ["a", "b"], with_pos=True).collect()
    got = sorted((r["__pos"], r["a"], r["b"]) for r in out)
    assert got == [(1, 1, "x"), (2, 2, "y"), (3, None, "z")]  # shorter padded with NULL


def test_limit_by(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=i) for i in range(5)] + [Row(g="b", v=9)]
    )
    out = limit_by(df, by=["g"], order=[F.desc("v")], n=2).collect()
    got = sorted((r["g"], r["v"]) for r in out)
    assert got == [("a", 3), ("a", 4), ("b", 9)]


def test_with_fill_interpolate_expr(spark):
    """Dict-form INTERPOLATE (c AS expr(prev)): filled rows get expr over
    the previous real value (single-step, documented non-recursive)."""
    df = spark.createDataFrame([Row(x=1, v=10.0), Row(x=4, v=40.0)])
    out = with_fill(df, "x", interpolate={"v": lambda prev: prev + 1}).collect()
    assert [r["v"] for r in out] == [10.0, 11.0, 11.0, 40.0]
