"""Operator-library queries: ASOF/ANY join, WITH FILL, WITH TOTALS, SAMPLE,
ARRAY JOIN — each SURVEY.md §2 operator that needed library code, proven
end-to-end against the DuckDB oracle.

Registered into the same QUERIES/ORACLES maps as queries.py (imported from
there for decorator side effects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.queries import _t, query


@query(
    "q_asof_join",
    oracle="""
    WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts, max(value) AS view_value FROM events
               WHERE event_type = 'view' GROUP BY user_id, ts)
    SELECT p.event_id                   AS purchase_id,
           p.user_id                    AS user_id,
           p.ts                         AS pts,
           CAST(p.value AS DOUBLE)      AS purchase_value,
           v.ts                         AS view_ts,
           CAST(v.view_value AS DOUBLE) AS view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY purchase_id
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF LEFT JOIN (src/Core/Joins.h:38,56): for each purchase, the
    latest view at-or-before it per user.

    union+window plan (operators/asof_join.py): ONE shuffle on user_id —
    no range explosion, no per-group Python; scales linearly in events.
    """
    from clickhouse_23_3_19_32_lts_spark.operators.asof_join import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return (
        asof_join(purchases, views, on="ts", by=["user_id"], strictness="<=", right_prefix="view_")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("pts"),
            F.col("value").cast("double").alias("purchase_value"),
            "view_ts",
            F.col("view_value").cast("double"),
        )
        .orderBy("purchase_id")
    )


@query(
    "q_any_join",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    SELECT c_custkey, c_name, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate
    FROM customer LEFT JOIN first_order ON c_custkey = o_custkey AND rn = 1
    ORDER BY c_custkey
    """,
)
def q_any_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY LEFT JOIN (JoinStrictness::Any, src/Core/Joins.h:36): each
    customer matched to at most one (deterministically first) order."""
    from clickhouse_23_3_19_32_lts_spark.operators.any_join import any_join

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").alias("first_orderdate"),
    )
    return any_join(
        cust,
        orders,
        on=["c_custkey"],
        how="left",
        order=[F.asc("first_orderdate"), F.asc("first_orderkey")],
    ).orderBy("c_custkey")


@query(
    "q_with_fill",
    oracle="""
    WITH base AS (
      SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n
      FROM events WHERE user_id < 3 GROUP BY 1, 2),
    bounds AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM base GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds)
    SELECT g.user_id AS user_id, CAST(g.day AS TIMESTAMP) AS day, coalesce(b.n, 0) AS n
    FROM grid g LEFT JOIN base b ON g.user_id = b.user_id AND g.day = b.day
    ORDER BY user_id, day
    """,
)
def q_with_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY day WITH FILL per user (FillingTransform §2.6): missing
    days materialized; counts default to 0 like ClickHouse column defaults.

    Grid generation is sequence()+explode per group — distributed, no
    driver loop; the join back is a shuffle on (user_id, day) only over
    the (tiny) grid cardinality, not the fact table.
    """
    from clickhouse_23_3_19_32_lts_spark.operators.with_fill import with_fill

    ev = _t(spark, sf_dir, "events")
    base = (
        ev.filter(F.col("user_id") < 3)
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    filled = with_fill(base, "day", step=86400, partition_by=["user_id"])
    return filled.select(
        "user_id", "day", F.coalesce("n", F.lit(0)).alias("n")
    ).orderBy("user_id", "day")


@query(
    "q_with_totals",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), ())
    ORDER BY l_returnflag NULLS LAST
    """,
)
def q_with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... WITH TOTALS (TotalsHavingTransform §2.4): per-group rows
    plus a grand-total row (NULL key) in ONE aggregation pass."""
    from clickhouse_23_3_19_32_lts_spark.operators.totals import with_totals

    li = _t(spark, sf_dir, "lineitem")
    return with_totals(
        li,
        ["l_returnflag"],
        [F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")],
    ).orderBy(F.asc_nulls_last("l_returnflag"))


@query(
    "q_sample_deterministic",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
          < 115292150460684697
    """,
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE k (MergeTreeDataSelectExecutor.cpp:496-610): deterministic
    hash-range sample on the sampling key. Uses the portable 60-bit
    md5-prefix hash so the exact subset is engine-reproducible (DuckDB
    computes the identical hash range); determinism and the reference's
    subset property (SAMPLE 0.1 ⊂ SAMPLE 0.2) are unit-tested."""
    from clickhouse_23_3_19_32_lts_spark.operators.sampling import sample_deterministic

    li = _t(spark, sf_dir, "lineitem")
    s = sample_deterministic(li, 0.1, "l_orderkey", portable=True)
    return s.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "q_array_join",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents WHERE doc_id < 200)
    SELECT word, count(*) AS n, min(pos) AS min_pos
    FROM w GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
)
def q_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY JOIN with position (ArrayJoinAction §2.2 / arrayEnumerate):
    tokenize → posexplode → word frequency. The explode runs inside
    whole-stage codegen; agg is standard two-phase."""
    from clickhouse_23_3_19_32_lts_spark.operators.arrayjoin import array_join

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = docs.select(F.split("text", " ").alias("word"))
    exploded = array_join(words, ["word"], with_pos=True)
    return (
        exploded.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"), F.min("__pos").cast("long").alias("min_pos"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


@query(
    "q_final_replacing",
    oracle="""
    WITH ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_type, event_id AS latest_event_id, ts AS latest_ts,
           CAST(value AS DOUBLE) AS latest_value
    FROM ranked WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def q_final_replacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT ... FINAL on a ReplacingMergeTree (§4.2 sorted-merge
    semantics): latest row per key by version — policies.replacing_final,
    treating events as a versioned upsert log keyed on (user_id,
    event_type) with ts as the version."""
    from clickhouse_23_3_19_32_lts_spark.policies import replacing_final

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "event_id", "ts", "value")
    return (
        replacing_final(ev, keys=["user_id", "event_type"], version="ts")
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.col("value").cast("double").alias("latest_value"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "q_session_window",
    oracle="""
    WITH e AS (SELECT user_id, ts, value FROM events WHERE user_id < 20),
         m AS (SELECT user_id, ts, value,
                      CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_s
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
               FROM m)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(sum(value) AS DOUBLE) AS total
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows in batch (session_window §2.9 — a superset of the
    reference's WindowView, which lacks sessions). Oracle: gap-based
    sessionization via lag + cumulative-sum session ids (a new session
    starts when the gap to the previous event is >= the 30-minute gap,
    matching Spark's merge-on-overlap rule); the streaming equivalence is
    tested in tests/test_streaming.py."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") < 20)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            F.col("total").cast("double"),
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q_join_kinds",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         urgent AS (SELECT o_custkey, count(*) AS n_urgent FROM orders
                    WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
    SELECT 'full' AS kind, count(*) AS n,
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_left,
           CAST(sum(CASE WHEN n_urgent IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_right
    FROM big_cust FULL OUTER JOIN urgent ON c_custkey = o_custkey
    UNION ALL
    SELECT 'right' AS kind, count(*) AS n,
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_left,
           CAST(0 AS BIGINT) AS null_right
    FROM big_cust RIGHT JOIN urgent ON c_custkey = o_custkey
    UNION ALL
    SELECT 'cross' AS kind, count(*) AS n, CAST(0 AS BIGINT) AS null_left, CAST(0 AS BIGINT) AS null_right
    FROM (SELECT * FROM big_cust LIMIT 10) CROSS JOIN (SELECT * FROM urgent LIMIT 10)
    ORDER BY kind
    """,
)
def q_join_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER / RIGHT / CROSS join kinds (src/Core/Joins.h:9) with
    ANSI-NULL non-match semantics (= join_use_nulls=1, SURVEY §1.3)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", "c_acctbal"
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    full = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "full_outer")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias("null_left"),
            F.sum(F.when(F.col("n_urgent").isNull(), 1).otherwise(0)).alias("null_right"),
        )
        .select(F.lit("full").alias("kind"), "n", "null_left", "null_right")
    )
    right = (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "right")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias("null_left"),
        )
        .select(F.lit("right").alias("kind"), "n", "null_left", F.lit(0).cast("long").alias("null_right"))
    )
    cross = (
        cust.orderBy("c_custkey").limit(10)
        .crossJoin(urgent.orderBy("o_custkey").limit(10))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("cross").alias("kind"),
            "n",
            F.lit(0).cast("long").alias("null_left"),
            F.lit(0).cast("long").alias("null_right"),
        )
    )
    return full.unionByName(right).unionByName(cross).orderBy("kind")


@query(
    "q_point_in_polygon",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(user_id % 17 AS DOUBLE) / 2 AS x,
             CAST(event_id % 19 AS DOUBLE) / 2 AS y
      FROM events),
    t AS (
      SELECT event_type,
             ((8 - 0) * (y - 0) - (0 - 0) * (x - 0)) AS s1,
             ((4 - 8) * (y - 0) - (8 - 0) * (x - 8)) AS s2,
             ((0 - 4) * (y - 8) - (0 - 8) * (x - 4)) AS s3
      FROM pts)
    SELECT event_type,
           CAST(sum(CASE WHEN s1 >= 0 AND s2 >= 0 AND s3 >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS inside,
           CAST(count(*) AS BIGINT) AS total
    FROM t GROUP BY event_type ORDER BY event_type
    """,
)
def q_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pointInPolygon((x,y), ring) (src/Functions/pointInPolygon.cpp):
    boundary-inclusive containment — here counted against the CCW triangle
    (0,0)-(8,0)-(4,8), which the oracle reproduces with exact half-plane
    sign tests. The engine side is the general ray-cast registry function
    (a pure codegen column expression, no UDF)."""
    from clickhouse_23_3_19_32_lts_spark.functions.registry import REGISTRY

    ev = _t(spark, sf_dir, "events")
    x = (F.col("user_id") % 17).cast("double") / 2
    y = (F.col("event_id") % 19).cast("double") / 2
    ring = F.array(
        F.struct(F.lit(0.0).alias("_1"), F.lit(0.0).alias("_2")),
        F.struct(F.lit(8.0).alias("_1"), F.lit(0.0).alias("_2")),
        F.struct(F.lit(4.0).alias("_1"), F.lit(8.0).alias("_2")),
        F.struct(F.lit(0.0).alias("_1"), F.lit(0.0).alias("_2")),
    )
    point = F.struct(x.alias("_1"), y.alias("_2"))
    inside = REGISTRY["pointInPolygon"](point, ring)
    return (
        ev.select("event_type", inside.cast("int").alias("i"))
        .groupBy("event_type")
        .agg(
            F.sum("i").cast("long").alias("inside"),
            F.count(F.lit(1)).cast("long").alias("total"),
        )
        .orderBy("event_type")
    )


@query(
    "q_with_fill_multi",
    oracle="""
    WITH src AS (
      SELECT CAST(ts AS DATE) AS d, CAST(user_id % 5 AS INT) AS b,
             count(*) AS c
      FROM events WHERE user_id < 40 GROUP BY 1, 2),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM src),
    pgrid AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds),
    sgrid AS (SELECT CAST(unnest(generate_series(0, 4)) AS INT) AS b),
    grid AS (SELECT d, b FROM pgrid CROSS JOIN sgrid),
    ins AS (
      SELECT g.d, g.b, CAST(0 AS BIGINT) AS c
      FROM grid g ANTI JOIN src s ON g.d = s.d AND g.b = s.b)
    SELECT d, b, c FROM src
    UNION ALL
    SELECT d, b, c FROM ins
    ORDER BY d, b
    """,
)
def q_with_fill_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column WITH FILL (FillingTransform grid semantics,
    src/Processors/Transforms/FillingTransform.h:16): primary date grid at
    1-day steps over min..max, secondary FROM 0 TO 5 static range per
    primary, inserted rows carry type defaults — the round-4 fill_grid
    operator, fully parallel (aggregate bounds + sequence/explode grids +
    anti-join dedup)."""
    from clickhouse_23_3_19_32_lts_spark.operators.with_fill import (
        FillItem,
        fill_grid,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    src = (
        ev.select(
            F.col("ts").cast("date").alias("d"),
            (F.col("user_id") % 5).cast("int").alias("b"),
        )
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return fill_grid(
        src,
        [
            FillItem(name="d"),
            FillItem(name="b", frm=F.lit(0), to=F.lit(5)),
        ],
    )
