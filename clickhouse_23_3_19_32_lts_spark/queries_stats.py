"""Statistical aggregate families round 2 (SURVEY §2.4): entropy,
groupArrayMovingSum/Avg, maxIntersections, welchTTest, mannWhitneyUTest.

The reference implements these as dedicated C++ aggregate states
(AggregateFunctionEntropy.cpp, AggregateFunctionGroupArrayMoving.cpp,
AggregateFunctionMaxIntersections.cpp, AggregateFunctionTTest.cpp,
AggregateFunctionMannWhitney.cpp). Spark-first: each is a composition of
windows + aggregates — closed-form, no UDAF, no Python — and therefore
oracle-checkable exactly. (p-values need a t/normal CDF; the statistics and
degrees of freedom are returned instead, which is what downstream pipelines
threshold on anyway.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.queries import _t, query


def _range_bucket(df: DataFrame, col: str, npart: int):
    """Deterministic range-bucket id column for a two-pass prefix sum.

    approxQuantile boundaries (one distributed sketch pass, bounded npart-1
    driver-side floats) become literal comparisons, so the bucket id is a
    pure function of the value — stable across plan-branch recomputation,
    unlike spark_partition_id after repartitionByRange, whose boundary
    sampling can differ between the two consumers of the same subtree."""
    qcol = F.col(col)
    if dict(df.dtypes)[col].startswith(("timestamp", "date")):
        qcol = qcol.cast("timestamp")
    qcol = qcol.cast("double")
    probs = [i / npart for i in range(1, npart)]
    splits = sorted(set(df.select(qcol.alias("__q")).approxQuantile("__q", probs, 0.01)))
    b = F.lit(0)
    for s in splits:
        b = b + F.when(qcol > F.lit(s), 1).otherwise(0)
    return b


def _partition_offsets(local: DataFrame, val_col: str) -> DataFrame:
    """Exclusive prefix-sum of per-bucket totals → (pid, off).

    Scale shape: the triangular self-join runs over P rows (P = shuffle
    partition count, ~hundreds on a real cluster), so no single-partition
    window and no driver collect is needed — the 100×-safe form of a global
    running-sum carry."""
    totals = local.groupBy("pid").agg(F.sum(val_col).alias("__tot"))
    t2 = totals.select(F.col("pid").alias("pid2"), F.col("__tot").alias("__tot2"))
    return (
        totals.join(F.broadcast(t2), F.col("pid2") < F.col("pid"), "left")
        .groupBy("pid")
        .agg(F.coalesce(F.sum("__tot2"), F.lit(0)).alias("off"))
    )


@query(
    "q_entropy",
    oracle="""
    WITH counts AS (
      SELECT user_id % 10 AS cohort, event_type, count(*) AS c
      FROM events GROUP BY 1, 2),
    tot AS (SELECT cohort, sum(c) AS t FROM counts GROUP BY 1)
    SELECT counts.cohort AS cohort,
           CAST(-sum((c * 1.0 / t) * log2(c * 1.0 / t)) AS DOUBLE) AS entropy
    FROM counts JOIN tot ON counts.cohort = tot.cohort
    GROUP BY counts.cohort
    ORDER BY cohort
    """,
)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entropy(x) (AggregateFunctionEntropy.cpp): Shannon entropy of the
    event-type distribution per cohort — two-level aggregation."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(
        (F.col("user_id") % 10).alias("cohort"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("cohort").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t")
    return (
        counts.join(tot, "cohort")
        .groupBy("cohort")
        .agg((-F.sum(p * F.log2(p))).alias("entropy"))
        .orderBy("cohort")
    )


@query(
    "q_moving_agg",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(value) OVER w3 AS DOUBLE) AS moving_sum3,
           CAST(avg(value) OVER w3 AS DOUBLE) AS moving_avg3
    FROM events WHERE user_id < 5
    WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def q_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupArrayMovingSum/Avg(3) (AggregateFunctionGroupArrayMoving.cpp):
    the per-row form — a 3-row sliding frame in event order."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w3 = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sum("value").over(w3).alias("moving_sum3"),
            F.avg("value").over(w3).alias("moving_avg3"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_max_intersections",
    oracle="""
    WITH intervals AS (
      SELECT ts AS s, ts + INTERVAL 1 HOUR AS e FROM events WHERE user_id < 50),
    points AS (
      SELECT s AS p, 1 AS d FROM intervals
      UNION ALL
      SELECT e AS p, -1 AS d FROM intervals),
    swept AS (
      SELECT sum(d) OVER (ORDER BY p, d DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
      FROM points)
    SELECT CAST(max(depth) AS BIGINT) AS max_intersections FROM swept
    """,
)
def q_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maxIntersections(start, end) (AggregateFunctionMaxIntersections.cpp):
    max concurrent intervals — classic sweep: +1/-1 deltas, running sum,
    max; ends sort after starts at ties (d DESC) matching the reference's
    closed-interval counting.

    Scale shape: two-pass prefix sum instead of a global window — range-
    repartition on the sweep key, per-partition running sums (partitioned
    window), then carry exact partition totals via _partition_offsets. No
    single-partition WindowExec anywhere (asserted in test_plan_quality)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    iv = ev.select(F.col("ts").alias("s"), (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"))
    points = iv.select(F.col("s").alias("p"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("e").alias("p"), F.lit(-1).alias("d"))
    )
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    pts = points.withColumn("pid", _range_bucket(points, "p", npart))
    wloc = W.partitionBy("pid").orderBy(F.asc("p"), F.desc("d")).rowsBetween(
        W.unboundedPreceding, 0
    )
    local = pts.withColumn("run", F.sum("d").over(wloc))
    offs = _partition_offsets(local, "d")
    return (
        local.join(F.broadcast(offs), "pid")
        .select((F.col("run") + F.col("off")).alias("depth"))
        .agg(F.max("depth").cast("long").alias("max_intersections"))
    )


@query(
    "q_welch_ttest",
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*) AS n, avg(value) AS m, var_samp(value) AS v
      FROM events WHERE event_type IN ('click', 'error')
      GROUP BY event_type),
    w AS (SELECT
            max(CASE WHEN event_type = 'click' THEN m END) AS m1,
            max(CASE WHEN event_type = 'error' THEN m END) AS m2,
            max(CASE WHEN event_type = 'click' THEN v END) AS v1,
            max(CASE WHEN event_type = 'error' THEN v END) AS v2,
            max(CASE WHEN event_type = 'click' THEN n END) AS n1,
            max(CASE WHEN event_type = 'error' THEN n END) AS n2
          FROM s)
    SELECT CAST((m1 - m2) / sqrt(v1/n1 + v2/n2) AS DOUBLE) AS t_stat,
           CAST(pow(v1/n1 + v2/n2, 2)
                / (pow(v1/n1, 2)/(n1-1) + pow(v2/n2, 2)/(n2-1)) AS DOUBLE) AS df
    FROM w
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """welchTTest(x, sample) (AggregateFunctionTTest.cpp): Welch's unequal-
    variance t statistic + Welch–Satterthwaite df, closed-form from per-
    sample (n, mean, var) — one aggregation pass."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "error"))
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    pick = lambda c, t: F.max(F.when(F.col("event_type") == t, F.col(c)))
    w = s.agg(
        pick("m", "click").alias("m1"), pick("m", "error").alias("m2"),
        pick("v", "click").alias("v1"), pick("v", "error").alias("v2"),
        pick("n", "click").alias("n1"), pick("n", "error").alias("n2"),
    )
    se1, se2 = F.col("v1") / F.col("n1"), F.col("v2") / F.col("n2")
    return w.select(
        ((F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2)).alias("t_stat"),
        (
            F.pow(se1 + se2, 2)
            / (F.pow(se1, 2) / (F.col("n1") - 1) + F.pow(se2, 2) / (F.col("n2") - 1))
        ).alias("df"),
    )


@query(
    "q_mann_whitney",
    oracle="""
    WITH both_samples AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS grp
      FROM events WHERE event_type IN ('click', 'error')),
    ranked AS (
      SELECT grp, rank() OVER (ORDER BY value)
                  + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS r
      FROM both_samples)
    SELECT CAST(sum(CASE WHEN grp = 1 THEN r END)
                - (sum(grp) * (sum(grp) + 1)) / 2.0 AS DOUBLE) AS u1,
           CAST(sum(grp) AS BIGINT) AS n1,
           CAST(sum(1 - grp) AS BIGINT) AS n2
    FROM ranked
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mannWhitneyUTest (AggregateFunctionMannWhitney.cpp): U statistic via
    midranks (average rank of each tied block), the standard rank-sum form.

    Scale shape: ranks come from a per-distinct-value aggregation plus a
    two-pass prefix sum (range repartition → partitioned local window →
    exact partition-total carry), not a global rank() window — the sweep
    never lands on a single reducer."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "error"))
    both = ev.select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("grp"),
    )
    byval = both.groupBy("value").agg(
        F.count(F.lit(1)).alias("c"), F.sum("grp").alias("c1")
    )
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    v = byval.withColumn("pid", _range_bucket(byval, "value", npart))
    wloc = W.partitionBy("pid").orderBy("value").rowsBetween(W.unboundedPreceding, -1)
    local = v.withColumn("cum_loc", F.coalesce(F.sum("c").over(wloc), F.lit(0)))
    offs = _partition_offsets(local, "c")
    # midrank of a tied block starting after cum rows of c ties:
    # min-rank + (c-1)/2 = cum + 1 + (c-1)/2 = cum + (c+1)/2
    ranked = local.join(F.broadcast(offs), "pid").select(
        "c",
        "c1",
        (F.col("cum_loc") + F.col("off") + (F.col("c") + 1) / 2.0).alias("r"),
    )
    n1 = F.sum("c1")
    return ranked.agg(
        (F.sum(F.col("c1") * F.col("r")) - (n1 * (n1 + 1)) / 2.0).alias("u1"),
        n1.cast("long").alias("n1"),
        (F.sum("c") - n1).cast("long").alias("n2"),
    )


@query(
    "q_linear_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_slope(l_extendedprice, l_quantity) AS DOUBLE)     AS slope,
           CAST(regr_intercept(l_extendedprice, l_quantity) AS DOUBLE) AS intercept,
           CAST(regr_r2(l_extendedprice, l_quantity) AS DOUBLE)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)     AS n
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simpleLinearRegression / stochasticLinearRegression families
    (AggregateFunctionMLMethod.cpp, SURVEY §2.4 ML): OLS per group via the
    closed-form regr_* aggregates — one pass, no iteration, exact."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_slope("l_extendedprice", "l_quantity").alias("slope"),
            F.regr_intercept("l_extendedprice", "l_quantity").alias("intercept"),
            F.regr_r2("l_extendedprice", "l_quantity").alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_sequence_count",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'signup' THEN 1 ELSE 2 END AS s
      FROM events WHERE event_type IN ('signup', 'purchase')),
    lists AS (
      SELECT user_id,
             list_transform(
               list_sort(list(struct_pack(ts := ts, event_id := event_id, s := s))),
               x -> x.s) AS ss
      FROM ev GROUP BY user_id)
    -- integer-encoded state machine: acc = chains*10 + state (DuckDB's
    -- list_reduce struct accumulators misbehave across multiple rows)
    SELECT user_id,
           CAST(list_reduce(
                  list_prepend(CAST(0 AS BIGINT), list_transform(ss, v -> CAST(v AS BIGINT))),
                  (acc, e) -> CASE WHEN e = 1 THEN (acc // 10) * 10 + 1
                                   WHEN (acc % 10) = 1 AND e = 2 THEN ((acc // 10) + 1) * 10
                                   ELSE acc END) // 10 AS BIGINT) AS n_chains
    FROM lists ORDER BY user_id
    """,
)
def q_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceCount('(?1).*(?2)')(ts, signup, purchase)
    (AggregateFunctionSequenceMatch.cpp): non-overlapping signup→purchase
    chains per user — a state machine folded over the time-sorted event
    array with a struct accumulator (aggregate() HOF, codegen, no UDAF;
    per-user buffering is the reference's own strategy for this family)."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        .select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.when(F.col("event_type") == "signup", 1).otherwise(2).alias("s"),
            ).alias("e"),
        )
    )
    per_user = ev.groupBy("user_id").agg(F.array_sort(F.collect_list("e")).alias("evs"))
    acc0 = F.struct(F.lit(0).alias("s"), F.lit(0).alias("c"))
    folded = F.aggregate(
        "evs",
        acc0,
        lambda acc, e: F.struct(
            F.when(e.getField("s") == 1, 1)
            .when((acc.getField("s") == 1) & (e.getField("s") == 2), 0)
            .otherwise(acc.getField("s"))
            .alias("s"),
            (
                acc.getField("c")
                + F.when((acc.getField("s") == 1) & (e.getField("s") == 2), 1).otherwise(0)
            ).alias("c"),
        ),
    )
    return (
        per_user.select("user_id", folded.getField("c").cast("long").alias("n_chains"))
        .orderBy("user_id")
    )


# --- contingency-table statistics (src/AggregateFunctions/CrossTab.h:
# cramersV, cramersVBiasCorrected, theilsU, contingency) ---------------------


def cross_tab_stats(df: DataFrame, a: str, b: str) -> DataFrame:
    """cramersV / cramersVBiasCorrected / theilsU / contingency, all from
    one shared pair-count pass — CrossTab.h keeps one (a,b)-count hash map
    and each statistic is a closed form over it.

    Shape at scale: ONE groupBy(a,b) shuffle over the data; the windows and
    final reduce run over the tiny cell relation (bounded by category
    cardinalities |a|·|b|, not data size).
    """
    cells = df.groupBy(a, b).agg(F.count(F.lit(1)).cast("double").alias("c"))
    cells = cells.select(
        F.col(a).alias("ka"),
        F.col(b).alias("kb"),
        "c",
        F.sum("c").over(W.partitionBy(a)).alias("ra"),
        F.sum("c").over(W.partitionBy(b)).alias("sb"),
        F.sum("c").over(W.partitionBy()).alias("n"),
        # flags the first cell of each a-row so the row total counts once
        (F.row_number().over(W.partitionBy(a).orderBy(b)) == 1).alias("lead_a"),
    )
    e = F.col("ra") * F.col("sb") / F.col("n")
    chi_term = (F.col("c") - e) ** 2 / e / F.col("n")
    # theilsU terms (natural log, matching CrossTab.h's log())
    ha_term = F.when(
        F.col("lead_a"), (F.col("ra") / F.col("n")) * F.log(F.col("ra") / F.col("n"))
    ).otherwise(0.0)
    dep_term = (F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("sb"))
    stats = cells.agg(
        F.sum(chi_term).alias("phi2"),
        F.first("n").alias("n"),
        F.countDistinct("ka").cast("double").alias("nr"),
        F.countDistinct("kb").cast("double").alias("ns"),
        F.sum(ha_term).alias("h_a"),
        F.sum(dep_term).alias("dep"),
    )
    q = F.least(F.col("nr"), F.col("ns"))
    nr1, ns1, n1 = F.col("nr") - 1, F.col("ns") - 1, F.col("n") - 1
    phi2c = F.greatest(F.lit(0.0), F.col("phi2") - nr1 * ns1 / n1)
    corr_a = F.col("nr") - nr1 * nr1 / n1
    corr_b = F.col("ns") - ns1 * ns1 / n1
    return stats.select(
        F.sqrt(F.col("phi2") / (q - 1)).alias("cramers_v"),
        F.sqrt(phi2c / (F.least(corr_a, corr_b) - 1)).alias("cramers_v_bias_corrected"),
        F.sqrt(F.col("phi2") / (F.col("phi2") + F.col("n"))).alias("contingency"),
        ((F.col("dep") - F.col("h_a")) / F.col("h_a")).alias("theils_u"),
    )


@query(
    "q_cross_tab_stats",
    oracle="""
    WITH cells AS (
      SELECT o_orderstatus AS ka, o_orderpriority AS kb,
             CAST(count(*) AS DOUBLE) AS c
      FROM orders GROUP BY 1, 2),
    ext AS (
      SELECT ka, kb, c,
             sum(c) OVER (PARTITION BY ka) AS ra,
             sum(c) OVER (PARTITION BY kb) AS sb,
             sum(c) OVER () AS n,
             row_number() OVER (PARTITION BY ka ORDER BY kb) = 1 AS lead_a
      FROM cells),
    stats AS (
      SELECT sum(pow(c - ra*sb/n, 2) / (ra*sb/n) / n) AS phi2,
             max(n) AS n,
             CAST(count(DISTINCT ka) AS DOUBLE) AS nr,
             CAST(count(DISTINCT kb) AS DOUBLE) AS ns,
             sum(CASE WHEN lead_a THEN (ra/n) * ln(ra/n) ELSE 0 END) AS h_a,
             sum((c/n) * ln(c/sb)) AS dep
      FROM ext)
    SELECT CAST(sqrt(phi2 / (least(nr, ns) - 1)) AS DOUBLE) AS cramers_v,
           CAST(sqrt(greatest(0.0, phi2 - (nr-1)*(ns-1)/(n-1))
                / (least(nr - (nr-1)*(nr-1)/(n-1),
                         ns - (ns-1)*(ns-1)/(n-1)) - 1)) AS DOUBLE)
             AS cramers_v_bias_corrected,
           CAST(sqrt(phi2 / (phi2 + n)) AS DOUBLE) AS contingency,
           CAST((dep - h_a) / h_a AS DOUBLE) AS theils_u
    FROM stats
    """,
)
def q_cross_tab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cramersV / cramersVBiasCorrected / contingency / theilsU
    (src/AggregateFunctions/CrossTab.h, AggregateFunctionCramersV.cpp,
    AggregateFunctionTheilsU.cpp): association between order status and
    priority — one pair-count shuffle, closed forms over the cells."""
    return cross_tab_stats(
        _t(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority"
    )


@query(
    "q_anova",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS ng,
             avg(value) AS mg, var_samp(value) AS vg
      FROM events GROUP BY 1),
    t AS (
      SELECT sum(ng) AS n, CAST(count(*) AS DOUBLE) AS k,
             sum(ng * mg) / sum(ng) AS m,
             sum(ng * mg * mg) - pow(sum(ng * mg), 2) / sum(ng) AS ssb,
             sum((ng - 1) * vg) AS ssw
      FROM g)
    SELECT CAST((ssb / (k - 1)) / (ssw / (n - k)) AS DOUBLE) AS f_stat,
           CAST(k - 1 AS DOUBLE) AS df_between,
           CAST(n - k AS DOUBLE) AS df_within
    FROM t
    """,
)
def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analysisOfVariance / anova (AggregateFunctionAnalysisOfVariance.cpp):
    one-way ANOVA F statistic over event values grouped by type — per-group
    (n, mean, var) partials then one closed-form combine; SSB computed from
    the same sums on both sides (no mean-subtraction drift)."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("ng"),
        F.avg("value").alias("mg"),
        F.var_samp("value").alias("vg"),
    )
    t = g.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).cast("double").alias("k"),
        (F.sum(F.col("ng") * F.col("mg") * F.col("mg"))
         - F.pow(F.sum(F.col("ng") * F.col("mg")), 2) / F.sum("ng")).alias("ssb"),
        F.sum((F.col("ng") - 1) * F.col("vg")).alias("ssw"),
    )
    return t.select(
        ((F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("n") - F.col("k")))).alias("f_stat"),
        (F.col("k") - 1).alias("df_between"),
        (F.col("n") - F.col("k")).alias("df_within"),
    )
