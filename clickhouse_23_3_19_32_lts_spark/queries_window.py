"""Window-function surface beyond the basics (SURVEY §2.5): ntile,
nth_value, RANGE frames, GROUPS-frame emulation, nonNegativeDerivative,
plus §2.6 OFFSET, §2.7 ALL-variant set ops, and §2.4 -Array/-Map
combinator forms.

Reference: WindowTransform.cpp:2460-2537 registers the dedicated window
functions; GROUPS frames (WindowDescription.h:31-32) have no Spark
equivalent and are emulated via dense_rank + a RANGE frame over it —
registered here as an oracle-checked query so the emulation is proven, not
just claimed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.queries import _t, query


@query(
    "q_window_ntile_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w AS INT)                      AS quartile,
           CAST(nth_value(o_totalprice, 2) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS second_highest,
           CAST(first_value(o_totalprice) OVER w AS DOUBLE)  AS top_price,
           CAST(last_value(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS bottom_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderkey
    LIMIT 500
    """,
)
def q_window_ntile_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / nth_value / first_value / last_value with explicit frames."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.ntile(4).over(w).alias("quartile"),
            F.nth_value("o_totalprice", 2).over(wfull).cast("double").alias("second_highest"),
            F.first("o_totalprice").over(w).cast("double").alias("top_price"),
            F.last("o_totalprice").over(wfull).cast("double").alias("bottom_price"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT user_id, ts, value,
           CAST(sum(value) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_1h,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1h
    FROM events WHERE user_id < 10
    ORDER BY user_id, ts
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time seconds: per-user trailing-hour rollup —
    the WindowTransform RANGE OFFSET frame (WindowDescription.h:31)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp_ltz").cast("double"))
        .rangeBetween(-3600, 0)
    )
    return (
        ev.select(
            "user_id",
            "ts",
            "value",
            F.sum("value").over(w).alias("rolling_1h"),
            F.count(F.lit(1)).over(w).alias("n_1h"),
        )
        .orderBy("user_id", "ts")
    )


@query(
    "q_window_groups_emulation",
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate,
             dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_shipdate) AS grp,
             l_returnflag
      FROM lineitem WHERE l_orderkey < 100)
    SELECT l_orderkey, l_linenumber,
           CAST(sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY grp
                RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_2groups
    FROM ranked
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_window_groups_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW emulation: dense_rank
    materializes the peer-group index, then a RANGE frame over it — the
    SURVEY §2.5 gap, proven equivalent via the oracle running the same
    two-step (DuckDB's native GROUPS frame agrees by construction)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    w_rank = W.partitionBy("l_returnflag").orderBy("l_shipdate")
    w_groups = W.partitionBy("l_returnflag").orderBy("grp").rangeBetween(-1, 0)
    return (
        li.withColumn("grp", F.dense_rank().over(w_rank))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.sum("l_quantity").over(w_groups).alias("qty_2groups"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_nonnegative_derivative",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             lag(value) OVER w AS pv,
             lag(ts)    OVER w AS pt
      FROM events WHERE user_id < 5
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, ts,
           CAST(CASE WHEN pv IS NULL THEN NULL
                     WHEN (value - pv) / (epoch(ts) - epoch(pt)) < 0 THEN 0
                     ELSE (value - pv) / (epoch(ts) - epoch(pt)) END AS DOUBLE) AS rate_per_sec
    FROM ordered
    ORDER BY user_id, ts
    """,
)
def q_nonnegative_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nonNegativeDerivative (WindowTransform.cpp:2460-2537): clamped
    per-second rate of change."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dv = F.col("value") - F.lag("value").over(w)
    # NTZ-safe seconds (parquet may carry TIMESTAMP_NTZ; UTC session pinned)
    sec = F.col("ts").cast("timestamp_ltz").cast("double")
    dt = sec - F.lag(sec).over(w)
    rate = dv / dt
    return (
        ev.select(
            "user_id",
            "ts",
            F.when(rate < 0, 0.0).otherwise(rate).alias("rate_per_sec"),
        )
        .orderBy("user_id", "ts")
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 50
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT n OFFSET m (OffsetTransform.cpp) — native in Spark 3.4+."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", F.col("o_totalprice").cast("double"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(50)
        .limit(20)
    )


@query(
    "q_set_ops_all",
    oracle="""
    WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'),
         b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R')
    SELECT 'intersect_all' AS op, count(*) AS n FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'except_all' AS op, count(*) AS n FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    ORDER BY op
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL (IntersectOrExceptTransform, §2.7) —
    multiplicity-preserving variants."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    out = (
        a.intersectAll(b).agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "n")
        .unionByName(
            a.exceptAll(b).agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("except_all").alias("op"), "n")
        )
    )
    return out.orderBy("op")


@query(
    "q_agg_array_combinator",
    oracle="""
    SELECT label,
           CAST(sum(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS DOUBLE) AS sum_all,
           CAST(max(list_max(embedding)) AS DOUBLE)  AS max_all,
           CAST(avg(len(embedding)) AS DOUBLE)       AS avg_len
    FROM embeddings GROUP BY label ORDER BY label
    """,
)
def q_agg_array_combinator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-Array combinator (sumArray/maxArray, registerAggregateFunctions
    :85-96): aggregate over all array elements per group — array folds in
    codegen feeding plain aggregates (no explode, no row blow-up)."""
    emb = _t(spark, sf_dir, "embeddings")
    elem_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda a, x: a + x.cast("double")
    )
    return (
        emb.groupBy("label")
        .agg(
            F.sum(elem_sum).alias("sum_all"),
            F.max(F.array_max("embedding")).cast("double").alias("max_all"),
            F.avg(F.size("embedding")).alias("avg_len"),
        )
        .orderBy("label")
    )


@query(
    "q_sum_map",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS keys_csv,
           CAST(sum(value) AS DOUBLE) AS total
    FROM events WHERE user_id < 10
    GROUP BY user_id ORDER BY user_id
    """,
)
def q_sum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sumMap surface (AggregateFunctionSumMap.cpp): per-key sums realized
    as map_from_entries over a groupBy — serialized here as (sorted key
    list, total) for oracle comparability; the map itself is built the same
    way in the library (explode → groupBy → map_from_entries)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("keys_csv"),
            F.sum("value").alias("total"),
        )
        .orderBy("user_id")
    )
