"""Similarity search over embedding columns (array<float>).

Reference: vector distances at src/Functions/array/arrayDistance.cpp:514-519
(L1/L2/cosine/dot); ANN index at src/Storages/MergeTree/MergeTreeIndexAnnoy.h:21.

Spark-first design:
  - distances are zip_with/aggregate expressions — codegen'd, no Python;
  - brute-force top-k: broadcast the (small) probe set, map-side distance,
    per-probe top-k via window. The shuffle carries only (probe, candidate,
    score) tuples that survive an optional score floor — at 100 TB with P
    probes the exchange is O(P·n) scores, never the vectors themselves.
  - IVF: deterministic k-means-free variant (centroids = a fixed sample of
    the corpus), cluster assignment is a broadcast-join + argmin (map-only),
    probing restricts search to nprobe clusters → scan cost drops by
    ~n_centroids/nprobe. The cluster id doubles as a partition key so a
    materialized index co-locates each cluster's vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.pipeline.spread import spread


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per probe: (probe_id, vec_id, score, rank).

    Baseline the approximate variants are measured against. Probe set is
    broadcast; ranking shuffles on probe_id only.
    """
    score = {
        "cosine": cosine_sim(vec_col, probe_vec_col),
        "dot": dot(vec_col, probe_vec_col),
        "l2": -F.sqrt(
            F.aggregate(
                F.zip_with(vec_col, probe_vec_col, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
    }[metric]
    scored = vectors.crossJoin(F.broadcast(probes)).select(
        F.col(probe_id_col),
        F.col(id_col),
        score.alias("score"),
        F.spark_partition_id().alias("__part"),
    )
    # two-phase top-k: partition-local rank first (keys = probe × source
    # partition, so no single reducer ever sorts all n scores for a probe),
    # then the global per-probe rank over only k × n_partitions survivors.
    w_local = W.partitionBy(probe_id_col, "__part").orderBy(F.desc("score"), F.asc(id_col))
    w = W.partitionBy(probe_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("__part", "__lr")
    )


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
) -> DataFrame:
    """IVF assignment: nearest centroid per vector (broadcast + argmin).

    Map-only: centroids broadcast, min_by picks the closest — no shuffle
    of the vector table.
    """
    d2 = F.aggregate(
        F.zip_with(vec_col, centroid_vec_col, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        spread(vectors, id_col).crossJoin(F.broadcast(centroids))
        .groupBy(id_col)
        .agg(
            F.min_by(centroid_id_col, d2).alias("cluster"),
            F.first(vec_col).alias(vec_col),
        )
    )


def ivf_topk(
    vectors: DataFrame,
    probes: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """IVF approximate top-k: search only the nprobe nearest clusters.

    centroids: (centroid_id, centroid_vec) — e.g. a deterministic corpus
    sample, or precomputed k-means. Returns (probe_id, vec_id, score, rank);
    recall vs brute_force_topk rises with nprobe (tested in unit tests).
    """
    assigned = assign_clusters(vectors, centroids, id_col, vec_col)
    probe_clusters = brute_force_topk(
        centroids.select(
            F.col("centroid_id").alias(id_col), F.col("centroid_vec").alias(vec_col)
        ),
        probes,
        k=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        probe_id_col=probe_id_col,
        probe_vec_col=probe_vec_col,
        metric="l2",
    ).select(F.col(probe_id_col), F.col(id_col).alias("cluster"))
    candidates = assigned.join(
        F.broadcast(probe_clusters), on="cluster"
    ).join(F.broadcast(probes), on=probe_id_col)
    w = W.partitionBy(probe_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        candidates.select(
            F.col(probe_id_col),
            F.col(id_col),
            cosine_sim(vec_col, probe_vec_col).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def build_ivf_index(
    vectors: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize an IVF index: vectors written as parquet hive-partitioned
    by cluster id (MergeTreeIndexAnnoy.h:21 analogue, but storage-native).

    Each cluster's vectors are co-located in its own partition directory, so
    a search touching nprobe clusters reads exactly those directories —
    partition pruning does the index lookup. Rebuild = recompute + overwrite
    (the same lifecycle as the reference's index rebuild on merge)."""
    assigned = assign_clusters(vectors, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)


def ivf_index_topk(
    spark,
    index_path: str,
    probes: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """Search a materialized IVF index: pick nprobe clusters per probe, read
    ONLY those partitions (partition-pruned scan — asserted in tests), score
    and rank. At 100 TB the scan cost is |index|·nprobe/n_centroids."""
    from pyspark.sql import functions as F  # local alias for clarity

    probe_clusters = brute_force_topk(
        centroids.select(
            F.col("centroid_id").alias(id_col), F.col("centroid_vec").alias(vec_col)
        ),
        probes,
        k=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        probe_id_col=probe_id_col,
        probe_vec_col=probe_vec_col,
        metric="l2",
    ).select(F.col(probe_id_col), F.col(id_col).alias("cluster"))

    wanted = [r["cluster"] for r in probe_clusters.select("cluster").distinct().collect()]
    index = spark.read.parquet(index_path).filter(F.col("cluster").isin(wanted))

    candidates = index.join(F.broadcast(probe_clusters), on="cluster").join(
        F.broadcast(probes), on=probe_id_col
    )
    w = W.partitionBy(probe_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        candidates.select(
            F.col(probe_id_col),
            F.col(id_col),
            cosine_sim(vec_col, probe_vec_col).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def nearest_centroid_blocks(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
) -> DataFrame:
    """Multi-probe IVF block assignment: each vector → its `nprobe` nearest
    centroids (L2, centroid-id tiebreak). Returns (id_col, block).

    Centroids broadcast; ranking is a per-vector window over n_centroids
    rows — map-side work only, no shuffle of the vector table. Deterministic
    (no RNG), so an external engine can recompute identical blocks.
    """
    d2 = F.aggregate(
        F.zip_with(
            vec_col, centroid_vec_col, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = W.partitionBy(id_col).orderBy(F.asc("__d2"), F.asc("block"))
    return (
        spread(vectors, id_col).crossJoin(F.broadcast(centroids))
        .select(F.col(id_col), F.col(centroid_id_col).alias("block"), d2.alias("__d2"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select(id_col, "block")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_on: Column | None = None,
    blocks: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim).

    `blocks` ((id_col, block), possibly several blocks per id — e.g. from
    nearest_centroid_blocks) is the scale path: candidate pairs come from a
    keyed equi-join on block (shuffles (id, block) tuples, never n²/2
    pairs), deduped, then scored by joining the vectors back. `block_on`
    (a Column over `vectors`) is the single-key variant. Default (neither)
    is the exact O(n²) pair scan — verification tiers only.
    """
    vectors = spread(vectors, id_col)
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if blocks is not None:
        # attach each vector to its block rows ONCE, score inline on the
        # keyed block join, then dedup pairs on a double. The previous
        # shape (pair distinct, then two joins back to the vector table)
        # shuffled the vector table twice more and planned an SMJ on the
        # candidate ids; a pair's cosine is identical in every shared
        # block, so first() after the (id_a, id_b) groupBy equals the old
        # distinct-then-score form.
        # the L2 norm rides along from a projection BELOW the block join:
        # one norm per vector instead of two norm folds per candidate pair
        # (the HOF aggregates are interpreted, so per-pair folds are the
        # dominant cost — this cuts 3 array walks per pair to 1). Same
        # doubles: dot/(norm_a*norm_b) is the exact cosine_sim expression
        # with the norms evaluated on the identical vectors.
        bv = blocks.select(F.col(id_col).alias("__id"), "block").join(
            vectors.select(
                F.col(id_col).alias("__id"),
                F.col(vec_col).alias("__v"),
                l2_norm(vec_col).alias("__n"),
            ),
            "__id",
        )
        x = bv.select(
            F.col("__id").alias("id_a"), "block",
            F.col("__v").alias("__va"), F.col("__n").alias("__na"),
        )
        y = bv.select(
            F.col("__id").alias("id_b"), "block",
            F.col("__v").alias("__vb"), F.col("__n").alias("__nb"),
        )
        # a pair's cos_sim is identical in every shared block, so the
        # threshold filter commutes with the pair dedup — filtering BEFORE
        # the groupBy keeps one-or-more copies of every qualifying pair
        # and drops all copies of the rest, so the dedup exchange carries
        # only matches (guide §2.3 filter-before-the-exchange)
        cos = dot("__va", "__vb") / (F.col("__na") * F.col("__nb"))
        return (
            x.join(y, "block")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
            .groupBy("id_a", "id_b")
            .agg(F.first("cos_sim").alias("cos_sim"))
        )
    if block_on is not None:
        blocked = vectors.select(F.col(id_col).alias("__id"), block_on.alias("__blk"))
        a = a.join(blocked.withColumnRenamed("__id", "id_a"), "id_a")
        b = b.join(blocked.withColumnRenamed("__id", "id_b"), "id_b")
        cond = (F.col("id_a") < F.col("id_b")) & (a["__blk"] == b["__blk"])
    else:
        cond = F.col("id_a") < F.col("id_b")
    return (
        a.join(b, cond)
        .select("id_a", "id_b", cosine_sim("__va", "__vb").alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
