"""Engine tests: registry, SQL, EXPLAIN variants, catalog DDL."""

from __future__ import annotations

import pytest

from clickhouse_23_3_19_32_lts_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


def test_registry_and_sql(engine):
    assert "lineitem" in engine.tables()
    n = engine.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    assert n > 0


def test_explain_modes(engine):
    q = "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem WHERE l_quantity > 10 GROUP BY l_returnflag"
    ast = engine.explain(q, "AST")
    assert "Aggregate" in ast or "UnresolvedRelation" in ast
    syntax = engine.explain(q, "SYNTAX")
    assert "Aggregate" in syntax
    tree = engine.explain(q, "QUERY TREE")
    assert "Aggregate" in tree
    plan = engine.explain(q, "PLAN")
    assert "HashAggregate" in plan and "PushedFilters" in plan
    est = engine.explain(q, "ESTIMATE")
    assert "sizeInBytes" in est
    with pytest.raises(ValueError):
        engine.explain(q, "NOPE")


def test_describe_rename_drop(engine, spark):
    cols = dict(engine.describe("region"))
    assert cols["r_name"] == "string"
    engine.register("tmp_t", spark.range(3).toDF("x"))
    engine.rename("tmp_t", "tmp_t2")
    assert "tmp_t2" in engine.tables() and "tmp_t" not in engine.tables()
    assert engine.sql("SELECT count(*) AS n FROM tmp_t2").collect()[0]["n"] == 3
    engine.drop("tmp_t2")
    assert "tmp_t2" not in engine.tables()


def test_create_table_policy_integration(spark, tmp_path):
    from pyspark.sql import Row

    from clickhouse_23_3_19_32_lts_spark.engine import Engine

    eng = Engine(spark)
    t = eng.create_table(
        "kv", str(tmp_path / "kv"), policy="replacing", keys=["k"], version="ver"
    )
    t.insert(spark.createDataFrame([Row(k=1, v="a", ver=1), Row(k=1, v="b", ver=2)]))
    eng.refresh("kv")
    rows = eng.sql("SELECT k, v FROM kv").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1, "b")]  # FINAL view


def test_live_view_watch_versions(spark, tmp_path):
    """LIVE VIEW: version bumps iff the underlying content changed."""
    from clickhouse_23_3_19_32_lts_spark.engine import Engine

    eng = Engine(spark)
    base = tmp_path / "lv_data"
    spark.range(0, 5).selectExpr("id AS v").write.mode("overwrite").parquet(str(base))
    spark.read.parquet(str(base)).createOrReplaceTempView("lv_src")
    lv = eng.create_live_view("lv1", "SELECT count() AS n FROM lv_src")
    df1, v1 = lv.watch()
    assert v1 == 1 and df1.first()["n"] == 5
    _, v2 = lv.watch()
    assert v2 == 1  # unchanged content -> same version
    spark.range(0, 3).selectExpr("id + 100 AS v").write.mode("append").parquet(str(base))
    spark.read.parquet(str(base)).createOrReplaceTempView("lv_src")
    df3, v3 = lv.watch()
    assert v3 == 2 and df3.first()["n"] == 8
    assert eng.live_view("lv1") is lv
