"""Star Schema Benchmark queries (BASELINE.md: SSB Q1.1-Q4.3 fully
specified at docs/en/getting-started/example-datasets/star-schema.md in the
reference). Adapted to the fixture star schema: lineitem ⋈ orders plays
lineorder; the date dimension is o_orderdate/l_shipdate arithmetic; part/
supplier/customer/nation/region as in TPC-H.

These are the reference's own canonical perf queries — kept separately so
the bench harness can time the SSB set against BASELINE's protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.queries import _t, query


@query(
    "ssb_q1_1",
    oracle="""
    SELECT CAST(sum(l_extendedprice * l_discount) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE year(l_shipdate) = 1996 AND l_discount BETWEEN 0.01 AND 0.03 AND l_quantity < 25
    """,
)
def ssb_q1_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q1.1: one-year discount revenue — pure scan+filter+agg; the
    year() predicate still prunes row groups via shipdate min/max."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1996)
            & F.col("l_discount").between(0.01, 0.03)
            & (F.col("l_quantity") < 25)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "ssb_q1_2",
    oracle="""
    SELECT CAST(sum(l_extendedprice * l_discount) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE year(l_shipdate) = 1996 AND month(l_shipdate) = 1
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity BETWEEN 26 AND 35
    """,
)
def ssb_q1_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q1.2: one-month variant (tighter date band)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1996)
            & (F.month("l_shipdate") == 1)
            & F.col("l_discount").between(0.04, 0.06)
            & F.col("l_quantity").between(26, 35)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "ssb_q2_1",
    oracle="""
    SELECT year(o_orderdate) AS o_year, p_brand,
           CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
    GROUP BY o_year, p_brand
    ORDER BY o_year, p_brand
    """,
)
def ssb_q2_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q2.1: revenue by year × brand for a category in a region —
    classic drill-down star join; every dim broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"), "p_brand")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("o_year", "p_brand")
    )


@query(
    "ssb_q3_1",
    oracle="""
    SELECT cn.n_name AS c_nation, sn.n_name AS s_nation, year(o_orderdate) AS o_year,
           CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey
    WHERE cr.r_name = 'ASIA' AND sr.r_name = 'ASIA'
      AND year(o_orderdate) BETWEEN 1996 AND 1997
    GROUP BY c_nation, s_nation, o_year
    ORDER BY o_year, revenue DESC, c_nation, s_nation
    """,
)
def ssb_q3_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q3.1: intra-region trade by nation pair and year."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate").between(1996, 1997))
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("c_nation"),
        F.col("n_regionkey").alias("cn_region"),
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("s_nation"),
        F.col("n_regionkey").alias("sn_region"),
    )
    cr = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        F.col("r_regionkey").alias("cr_key")
    )
    sr = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        F.col("r_regionkey").alias("sr_key")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cr), F.col("cn_region") == F.col("cr_key"))
        .join(F.broadcast(sr), F.col("sn_region") == F.col("sr_key"))
        .groupBy("c_nation", "s_nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("o_year", F.desc("revenue"), "c_nation", "s_nation")
    )


@query(
    "ssb_q4_1",
    oracle="""
    SELECT year(o_orderdate) AS o_year, cn.n_name AS c_nation,
           CAST(sum(l_extendedprice * (1 - l_discount) - l_extendedprice * l_tax) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    WHERE cr.r_name = 'AMERICA' AND p_type IN ('ECONOMY', 'PROMO')
    GROUP BY o_year, c_nation
    ORDER BY o_year, c_nation
    """,
)
def ssb_q4_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSB Q4.1: profit (revenue − tax proxy for supplycost) by year ×
    customer nation over selected part types."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type").isin("ECONOMY", "PROMO"))
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("c_nation"),
        F.col("n_regionkey").alias("cn_region"),
    )
    cr = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA").select(
        F.col("r_regionkey").alias("cr_key")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "l_extendedprice"
    ) * F.col("l_tax")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(cr), F.col("cn_region") == F.col("cr_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"), "c_nation")
        .agg(F.sum(profit).alias("profit"))
        .orderBy("o_year", "c_nation")
    )
