"""Aggregate-projection tests: summary answers == base-table answers,
coarser GROUP BYs re-aggregate partials, incremental refresh equals a full
rebuild, and the registry falls back when a query isn't derivable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.projections import AggregateProjection, ProjectionRegistry


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture()
def proj(spark, lineitem, tmp_path):
    p = AggregateProjection(
        spark,
        str(tmp_path / "proj"),
        keys=["l_returnflag", "l_linestatus"],
        measures=["l_quantity", "l_extendedprice"],
    )
    p.build(lineitem)
    return p


def _agg_map(df, keys):
    return {tuple(r[k] for k in keys): tuple(r[c] for c in df.columns if c not in keys) for r in df.collect()}


def test_projection_exact_keys(proj, lineitem):
    aggs = {"sum_qty": ("sum", "l_quantity"), "n": ("count", "*"), "avg_price": ("avg", "l_extendedprice")}
    got = proj.query(["l_returnflag", "l_linestatus"], aggs)
    want = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.avg("l_extendedprice").alias("avg_price"),
    )
    g, w = _agg_map(got, ["l_returnflag", "l_linestatus"]), _agg_map(want, ["l_returnflag", "l_linestatus"])
    assert g.keys() == w.keys()
    for k in g:
        for a, b in zip(g[k], w[k]):
            assert a == pytest.approx(b)


def test_projection_coarser_group(proj, lineitem):
    """GROUP BY a subset of keys re-aggregates stored partials (the
    two-level-groupings trick projections exist for)."""
    got = proj.query(["l_returnflag"], {"mx": ("max", "l_extendedprice"), "s": ("sum", "l_quantity")})
    want = lineitem.groupBy("l_returnflag").agg(
        F.max("l_extendedprice").alias("mx"), F.sum("l_quantity").alias("s")
    )
    assert _agg_map(got, ["l_returnflag"]) == pytest.approx(_agg_map(want, ["l_returnflag"]))


def test_projection_scan_is_summary_not_base(proj):
    plan = proj.query(["l_returnflag"], {"s": ("sum", "l_quantity")})._jdf.queryExecution().executedPlan().toString()
    assert "proj" in plan and "lineitem.parquet" not in plan  # summary scan only


def test_incremental_refresh_equals_rebuild(spark, lineitem, tmp_path):
    old = lineitem.filter(F.col("l_orderkey") % 2 == 0)
    new = lineitem.filter(F.col("l_orderkey") % 2 == 1)
    inc = AggregateProjection(spark, str(tmp_path / "inc"), keys=["l_returnflag"], measures=["l_quantity"])
    inc.build(old)
    inc.refresh(new)
    full = AggregateProjection(spark, str(tmp_path / "full"), keys=["l_returnflag"], measures=["l_quantity"])
    full.build(lineitem)
    aggs = {"s": ("sum", "l_quantity"), "n": ("count", "*"), "mn": ("min", "l_quantity")}
    a = _agg_map(inc.query(["l_returnflag"], aggs), ["l_returnflag"])
    b = _agg_map(full.query(["l_returnflag"], aggs), ["l_returnflag"])
    assert a == pytest.approx(b)


def test_cannot_answer(proj):
    assert not proj.can_answer(["l_suppkey"], {"s": ("sum", "l_quantity")})  # key not covered
    assert not proj.can_answer(["l_returnflag"], {"d": ("avg", "l_discount")})  # measure missing
    assert not proj.can_answer(["l_returnflag"], {"u": ("countDistinct", "l_quantity")})  # not derivable
    with pytest.raises(ValueError):
        proj.query(["l_suppkey"], {"s": ("sum", "l_quantity")})


def test_registry_rewrite_and_fallback(spark, lineitem, proj):
    reg = ProjectionRegistry()
    reg.register("lineitem", proj)
    got, used = reg.aggregate(
        "lineitem", lineitem, ["l_returnflag"], {"s": ("sum", "l_quantity")}
    )
    assert used is True
    want = {r["l_returnflag"]: r["s"] for r in lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()}
    assert {r["l_returnflag"]: r["s"] for r in got.collect()} == pytest.approx(want)
    # non-derivable → falls back to the base table
    got2, used2 = reg.aggregate(
        "lineitem", lineitem, ["l_suppkey"], {"s": ("sum", "l_quantity")}
    )
    assert used2 is False and got2.count() > 0


def test_engine_projection_substitution(spark, sf_dir, tmp_path):
    from clickhouse_23_3_19_32_lts_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.create_projection(
        "lineitem", str(tmp_path / "li_proj"), keys=["l_returnflag"], measures=["l_quantity"]
    )
    got = eng.aggregate("lineitem", ["l_returnflag"], {"s": ("sum", "l_quantity")})
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__sum_l_quantity" in plan  # answered from the summary partials
    want = {
        r["l_returnflag"]: r["s"]
        for r in eng.table("lineitem").groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()
    }
    assert {r["l_returnflag"]: r["s"] for r in got.collect()} == pytest.approx(want)


# --- -State / -Merge (AggregateFunction columns) ----------------------------


def test_hll_state_merge_equals_oneshot(spark, lineitem):
    """Sketch states built per batch and merged must give EXACTLY the same
    estimate as a one-shot sketch (Datasketches HLL union is deterministic
    and order-insensitive) — the AggregatingMergeTree guarantee."""
    from clickhouse_23_3_19_32_lts_spark.functions import states as S

    batches = [
        lineitem.filter(F.pmod("l_orderkey", F.lit(2)) == i)
        .groupBy("l_returnflag")
        .agg(S.uniqState("l_partkey").alias("st"))
        for i in range(2)
    ]
    merged = (
        batches[0].unionByName(batches[1])
        .groupBy("l_returnflag")
        .agg(S.uniqMerge("st").alias("u"))
    )
    oneshot = lineitem.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("u")
    )
    g = {r["l_returnflag"]: r["u"] for r in merged.collect()}
    w = {r["l_returnflag"]: r["u"] for r in oneshot.collect()}
    assert g == w
    exact = {
        r["l_returnflag"]: r["u"]
        for r in lineitem.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("u")).collect()
    }
    for k in exact:  # HLL lgK=12 error ~1.6%; assert a loose 5% envelope
        assert abs(g[k] - exact[k]) / exact[k] < 0.05


def test_state_roundtrip_through_parquet(spark, lineitem, tmp_path):
    """States must survive storage: write partials to parquet, read back,
    merge — equal to the in-memory merge (DataTypeAggregateFunction's
    serialized-state contract)."""
    from clickhouse_23_3_19_32_lts_spark.functions import states as S

    partials = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        S.uniqState("l_partkey").alias("st_u"),
        S.avgState("l_quantity").alias("st_a"),
    )
    path = str(tmp_path / "states")
    partials.write.parquet(path)
    merged = (
        spark.read.parquet(path)
        .groupBy("l_returnflag")
        .agg(S.uniqMerge("st_u").alias("u"), S.avgMerge("st_a").alias("a"))
    )
    direct = partials.groupBy("l_returnflag").agg(
        S.uniqMerge("st_u").alias("u"), S.avgMerge("st_a").alias("a")
    )
    g = {r["l_returnflag"]: (r["u"], round(r["a"], 9)) for r in merged.collect()}
    w = {r["l_returnflag"]: (r["u"], round(r["a"], 9)) for r in direct.collect()}
    assert g == w


def test_projection_uniq_measure(spark, lineitem, tmp_path):
    """A projection with uniq_measures answers uniq() queries from stored
    HLL states — including after incremental refresh — with the same
    estimate as a one-shot sketch over the full table."""
    p = AggregateProjection(
        spark,
        str(tmp_path / "uproj"),
        keys=["l_returnflag"],
        measures=["l_quantity"],
        uniq_measures=["l_partkey"],
    )
    old = lineitem.filter(F.col("l_orderkey") % 5 != 0)
    new = lineitem.filter(F.col("l_orderkey") % 5 == 0)
    p.build(old)
    p.refresh(new)
    got = p.query(["l_returnflag"], {"u": ("uniq", "l_partkey"), "s": ("sum", "l_quantity")})
    want = lineitem.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("u"),
        F.sum("l_quantity").alias("s"),
    )
    g = {r["l_returnflag"]: (r["u"], float(r["s"])) for r in got.collect()}
    w = {r["l_returnflag"]: (r["u"], float(r["s"])) for r in want.collect()}
    assert g == w


def test_registry_uniq_fallback(spark, lineitem, tmp_path):
    reg = ProjectionRegistry()
    df, used = reg.aggregate(
        "lineitem", lineitem, ["l_returnflag"], {"u": ("uniq", "l_partkey")}
    )
    assert not used and df.collect()
