"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Reference: ngramMinHash*/wordShingleMinHash*/ngramSimHash*/wordShingleSimHash*
(src/Functions/FunctionsStringHash.cpp:766-793) compute the sketches; the
reference leaves candidate generation to the user. Here the full pipeline is
provided: sketch (map-only, codegen'd HOFs — no Python, no shuffle) →
candidate blocking (one shuffle on band/block key) → verify (pair join).

Scale design:
  - Sketches are per-row expressions: at 100 TB this is a map stage fused
    into the scan by whole-stage codegen.
  - LSH banding shuffles (doc_id, band_key) pairs — ~n_bands rows per doc,
    NOT the text — then self-joins within buckets. Bucket skew (a band key
    shared by k docs) costs k² pairs; the `max_bucket` guard drops
    degenerate buckets exactly like production LSH dedup pipelines.
  - SimHash blocking uses the pigeonhole principle: hamming(a,b) <= d and
    nblocks > d ⇒ some block equal — candidates come from nblocks equality
    joins (shuffle on 15-bit block key), never a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from clickhouse_23_3_19_32_lts_spark.pipeline.hashing import portable_hash64
from clickhouse_23_3_19_32_lts_spark.pipeline.spread import spread


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup on `cols`: one canonical row per distinct value tuple
    (minimum id — deterministic), `dup_count` = group size.

    Hash-groupBy on the dedup key: single shuffle; the md5 digest (not the
    full text) is the shuffle key, so wide text columns don't inflate the
    exchange when `hash_key=True` semantics are desired — here we group by
    the digest and keep min(id) + count only.
    """
    digest = F.md5(F.concat_ws("\x00", *[F.col(c) for c in cols]))
    return (
        df.select(F.col(id_col), digest.alias("__digest"))
        .groupBy("__digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("__digest")
    )


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------


def word_shingles(text: Column | str, k: int = 3, distinct: bool = True) -> Column:
    """k-word shingles of a space-tokenized text column (codegen'd).

    Short docs (< k words) produce one shingle = the whole doc, matching
    the oracle's concat_ws-with-null-skip behavior.
    """
    t = F.col(text) if isinstance(text, str) else text
    w = F.split(t, " ")
    n = F.greatest(F.size(w) - (k - 1), F.lit(1))
    sh = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", F.slice(w, i, k)),
    )
    return F.array_distinct(sh) if distinct else sh


# Universal-hash family over a 28-bit base hash: h_i(x) = (a_i·h0(x) + b_i)
# mod P.  ONE md5 per shingle; the 16 permutations are integer mixes —
# products stay < 2^59, no BIGINT overflow in either engine.
MINHASH_P = (1 << 31) - 1
_MIX = [((2 * i + 1) * 2654435761 % MINHASH_P, (i * 40503 + 12345) % MINHASH_P) for i in range(64)]


def shingle_base_hash(s: Column) -> Column:
    """28-bit portable base hash of one shingle (first 7 md5 hex chars)."""
    return F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")


def minhash_signature(shingles: Column, n_hashes: int = 16) -> Column:
    """MinHash signature: array of n_hashes mins over the universal-hash
    family. Pure expression — codegen'd, no UDF, no shuffle. (For corpus-
    scale runs minhash_lsh_pairs uses the explode+agg form instead: same
    math, vectorized partial aggregation.)
    """
    base = F.transform(shingles, shingle_base_hash)
    mins = [
        F.array_min(
            F.transform(base, (lambda a, b: lambda h: (h * a + b) % MINHASH_P)(a, b))
        )
        for a, b in _MIX[:n_hashes]
    ]
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs: (id_a, id_b, est_jaccard).

    shingle → signature (map-only) → band keys → bucket self-join →
    positionwise signature agreement >= threshold. Pairs surface once
    (min band index) so downstream dedup sees no duplicates.
    """
    if n_hashes % bands:
        raise ValueError("bands must divide n_hashes")
    rows = n_hashes // bands

    # small-input / expensive-map: parallelize the shingle+md5 explode
    # across all task slots (no-op at scale — see pipeline/spread.py)
    df = spread(df, id_col)

    # Construction is SQL-string expressions (F.expr/selectExpr): the
    # combinator form cost ~2000 py4j round trips ≈ 0.4 s of driver time
    # per build (profiled r9); the strings parse JVM-side to the identical
    # analyzed expressions (oracle hash-proven).

    # explode + partial-agg signature: ONE md5 per (doc, shingle) row, the
    # 16 permuted mins fold map-side — the shuffle carries |docs|×n_hashes
    # longs, never the shingles. (The expression-form minhash_signature()
    # computes identical values; this form guarantees the single hash pass.)
    w = f"split(`{text_col}`, ' ')"
    shingles = (
        f"array_distinct(transform(sequence(1, greatest(size({w}) - {k - 1}, 1)),"
        f" i -> concat_ws(' ', slice({w}, i, {k}))))"
    )
    hashed = df.selectExpr(
        f"`{id_col}` as __id", f"explode({shingles}) as __s"
    ).selectExpr("__id", "cast(conv(substring(md5(__s), 1, 7), 16, 10) as bigint) as __h")
    sig = (
        hashed.groupBy("__id")
        .agg(
            *[
                F.expr(f"min((__h * {a} + {b}) % {MINHASH_P})").alias(f"__m{i}")
                for i, (a, b) in enumerate(_MIX[:n_hashes])
            ]
        )
        .selectExpr(
            "__id",
            "array(" + ", ".join(f"__m{i}" for i in range(n_hashes)) + ") as __sig",
        )
    )

    banded = sig.selectExpr(
        "__id",
        "__sig",
        f"posexplode(transform(sequence(0, {bands - 1}),"
        f" b -> concat_ws(',', transform(slice(__sig, b * {rows} + 1, {rows}),"
        f" v -> cast(v as string))))) as (__band, __key)",
    )

    # degenerate-bucket guard: skip band keys shared by > max_bucket docs.
    # A window count over (band, key) instead of groupBy + join-back: the
    # join form re-planned the whole signature subtree (scan + md5 pass)
    # once per side PLUS once per bucket-count build — 4 full MinHash
    # passes over the corpus in the round-8 plan. The window (a) needs no
    # second copy of the subtree, and (b) leaves the rows hash-partitioned
    # and sorted on exactly the self-join key, so the pair join below plans
    # one Exchange whose other side is a ReusedExchange: ONE md5 pass total.
    banded = (
        banded.withColumn(
            "__bn", F.expr("count(1) over (partition by __band, __key)")
        )
        .filter(F.col("__bn") <= max_bucket)
        .drop("__bn")
    )

    # estimate per matched bucket row, BEFORE the pair dedup: a pair's
    # signatures are identical in every band it collides in, so first() over
    # the per-row estimate equals the old carry-the-arrays-then-estimate
    # form — but the (id_a, id_b) exchange now moves one double instead of
    # two 16-long arrays, and a double agg buffer keeps the dedup in a
    # HashAggregate (the array-typed first() planned a SortAggregate).
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            F.expr("a.__band = b.__band and a.__key = b.__key and a.__id < b.__id"),
        )
        .selectExpr(
            "a.__id as id_a",
            "b.__id as id_b",
            "cast(aggregate(zip_with(a.__sig, b.__sig, (x, y) -> cast((x = y) as int)),"
            f" 0, (acc, v) -> acc + v) as double) / {n_hashes} as est_jaccard",
        )
        .groupBy("id_a", "id_b")
        .agg(F.first("est_jaccard").alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def true_jaccard(text_a: Column, text_b: Column, k: int = 3) -> Column:
    """Exact word-shingle Jaccard similarity of two text columns."""
    sa, sb = word_shingles(text_a, k), word_shingles(text_b, k)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    return inter / (F.size(sa) + F.size(sb) - inter)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def _simhash60_from_hashes(hashes: Column) -> Column:
    """60-bit SimHash fold over a PRE-COMPUTED token-hash array column.

    bit_j(simhash) = majority of bit_j over token hashes. The fold walks
    the array 60 times (once per bit), so `hashes` MUST be a materialized
    attribute, not an inlined expression — higher-order functions are
    interpreted (CodegenFallback), and an inlined md5-transform would be
    re-evaluated on every one of the 60 walks (measured ~20 s vs ~2 s on
    5k docs at sf0.1). Null input folds to 0, matching the inlined form
    (CASE WHEN null>0 falls to the 0 branch on every bit).
    """
    # 2^j as a literal lookup array: shiftleft() needs a compile-time shift
    # amount, but j is a lambda variable — element_at on a const array keeps
    # the whole expression in codegen.
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(60)])
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(59)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda a, h: a
                + F.when(h.bitwiseAND(F.element_at(powers, j + 1)) != 0, 1).otherwise(-1),
            )
            > 0,
            F.element_at(powers, j + 1),
        ).otherwise(F.lit(0).cast("long")),
    )


def token_hashes(text: Column | str) -> Column:
    """Portable 60-bit hash per whitespace token (one md5 per token)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.transform(F.split(t, " "), lambda w: portable_hash64(w))


def simhash60(text: Column | str) -> Column:
    """60-bit SimHash over whitespace tokens (wordShingleSimHash analogue).

    Single-Column convenience form: the token-hash transform is inlined,
    so the 60-walk fold re-hashes every token per bit — fine for tests
    and ad-hoc use. The pipeline path (simhash_pairs) materializes the
    hash array in its own projection instead and pays one md5 per token.
    60 bits (not 64) because the portable hash is 60-bit; avoids
    signed-overflow on bit 63 in both engines.
    """
    return _simhash60_from_hashes(token_hashes(text))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
    n_blocks: int = 10,
) -> DataFrame:
    """SimHash near-duplicate pairs: (id_a, id_b, hamming).

    Pigeonhole blocking: split the 60-bit hash into n_blocks 6-bit... no —
    n_blocks equal-width blocks; if hamming <= max_hamming < n_blocks then
    at least one block matches exactly, so candidates = union of n_blocks
    equality self-joins (one shuffle), never a cross join. Exact for
    max_hamming < n_blocks; callers wanting larger radii raise n_blocks.
    """
    if max_hamming >= n_blocks:
        raise ValueError("exactness requires max_hamming < n_blocks")
    width = 60 // n_blocks

    df = spread(df, id_col)
    # Two-projection sketch: materialize the per-token hash array FIRST,
    # then fold it into the 60-bit simhash. The fold walks the array 60
    # times; with the md5 transform inlined (the old simhash60(text) form)
    # every walk re-hashed every token — 60x the md5 work, measured ~20 s
    # vs ~2 s at sf0.1. Three deliberate properties of this expression:
    #  - the isNull() branch is a SECOND reference to __hs, which stops
    #    CollapseProject from re-inlining the transform into the fold (an
    #    alias referenced more than once is never inlined);
    #  - the when/coalesce make __sh NON-NULLABLE, so the hamming join
    #    condition cannot spawn an inferred isnotnull(__sh) constraint —
    #    round-10 profiling caught such a constraint being pushed to the
    #    scan with the whole fold (and its 60x md5) substituted back in,
    #    a 20x slowdown hidden below an innocent-looking Filter;
    #  - null text still folds to 0, matching the inlined form (CASE WHEN
    #    null>0 lands in the 0 branch on every bit).
    # No barrier/shuffle involved, so all three hold at cluster scale
    # where spread() is a no-op.
    zero = F.lit(0).cast("long")
    hs = df.select(
        F.col(id_col).alias("__id"), token_hashes(text_col).alias("__hs")
    )
    sh = hs.select(
        "__id",
        F.when(F.col("__hs").isNull(), zero)
        .otherwise(F.coalesce(_simhash60_from_hashes(F.col("__hs")), zero))
        .alias("__sh"),
    )
    # block keys as a compile-time expression list (shift amounts are ints)
    block_exprs = F.array(
        *[
            F.shiftrightunsigned(F.col("__sh"), b * width).bitwiseAND(
                F.lit((1 << width) - 1).cast("long")
            )
            for b in range(n_blocks)
        ]
    )
    blocked = sh.select("__id", "__sh", F.posexplode(block_exprs).alias("__blk", "__key"))
    a, b = blocked.alias("a"), blocked.alias("b")
    # hamming is a function of the PAIR (same value in every colliding
    # block), so the radius filter commutes with the pair dedup — apply it
    # BEFORE the distinct (guide §2.3 filter-before-the-exchange): the
    # dedup exchange then carries only within-radius pairs instead of
    # every block collision (measured 19.5s -> ~2s at sf0.1, where the 12
    # block joins emit ~5M collision rows but few survive hamming<=10).
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__key") == F.col("b.__key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (inverted-index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 2,
    threshold: float = 0.4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Exact word-k-gram Jaccard pairs >= threshold: (id_a, id_b, jaccard).

    Candidate/verify plan: the inverted index (explode distinct shingles →
    self-join keyed on shingle) only GENERATES candidate pairs, and drops
    shingles shared by > max_bucket docs first — one boilerplate shingle
    (license header, nav text) shared by k docs would otherwise emit k²
    join rows. Verification then recomputes the EXACT Jaccard over the full
    shingle sets of candidates only, so the guard affects which pairs are
    considered (those sharing ≥1 non-hot shingle — for near-dup thresholds
    a pair sharing ONLY ubiquitous shingles is far below threshold anyway)
    but never the reported similarity values.
    """
    df = spread(df, id_col)
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(text_col, k)).alias("__sh"),
    )

    # hot-shingle guard as a window count over __sh rather than
    # groupBy + join-back: one copy of the exploded-shingle subtree instead
    # of two, and the rows come out hash-partitioned on __sh — exactly the
    # inverted-index self-join key, so the candidate join reuses the same
    # exchange for both sides (round-8 plan re-ran the scan+explode per use).
    shf = sh.withColumn("__f", F.count(F.lit(1)).over(W.partitionBy("__sh")))
    idx = shf.filter(F.col("__f") <= max_bucket).drop("__f")

    # Candidate pairs WITH their common-shingle count in one aggregation:
    # per-doc shingles are distinct, so the index self-join emits exactly
    # one row per (pair, common non-hot shingle) and count(*) IS
    # |A ∩ B ∩ non-hot|. Round-9 shape `distinct` + re-join both docs'
    # full shingle arrays + array_intersect paid ~110 string hashes per
    # surviving pair (36.5M join rows → 12.5M pairs × 54-element arrays at
    # sf0.1); the groupBy rides the identical exchange the distinct used
    # and replaces the array verify with integer math.
    # The explicit repartition BEFORE the groupBy looks redundant but is a
    # measured 1.7x on the whole query (9.7s -> 5.7s at sf0.1): a pair's
    # collision rows live in different __sh partitions, so map-side partial
    # aggregation achieves ~zero reduction while paying a multi-million-
    # entry hash build per task. Pre-shuffling the raw (id_a, id_b) rows
    # moves the same bytes but lets both aggregate phases run fused after
    # the exchange. The same scatter argument holds at corpus scale.
    ia, ib = idx.alias("ia"), idx.alias("ib")
    pairs = (
        ia.join(ib, (F.col("ia.__sh") == F.col("ib.__sh")) & (F.col("ia.__id") < F.col("ib.__id")))
        .select(
            F.col("ia.__id").alias("id_a"),
            F.col("ib.__id").alias("id_b"),
        )
        .repartition(F.col("id_a"), F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )

    # Exactness correction for the shingles the index guard dropped:
    # |A ∩ B| = |A ∩ B ∩ non-hot| + |A_hot ∩ B_hot|, where the per-doc hot
    # arrays hold only shingles shared by > max_bucket docs — a set bounded
    # by (total shingle rows / max_bucket), i.e. tiny (empty at the test
    # SFs) — so the intersect is over near-empty arrays, never the full
    # shingle sets. Doc sizes |A|, |B| ride along on the same per-doc meta
    # row. The meta joins are keyed on the doc id and left to the planner
    # (broadcast locally; plain shuffle joins at corpus scale).
    hot = shf.filter(F.col("__f") > max_bucket).groupBy("__id").agg(
        F.collect_set("__sh").alias("__hot")
    )
    empty = F.expr("cast(array() as array<string>)")
    meta = (
        df.select(
            F.col(id_col).alias("__id"),
            F.size(word_shingles(text_col, k)).alias("__n"),
        )
        .join(hot, "__id", "left")
        .select("__id", "__n", F.coalesce(F.col("__hot"), empty).alias("__hot"))
    )
    ma = meta.select(
        F.col("__id").alias("id_a"),
        F.col("__n").alias("__na"),
        F.col("__hot").alias("__ha"),
    )
    mb = meta.select(
        F.col("__id").alias("id_b"),
        F.col("__n").alias("__nb"),
        F.col("__hot").alias("__hb"),
    )
    c = (
        F.col("__c") + F.size(F.array_intersect(F.col("__ha"), F.col("__hb")))
    ).cast("double")
    return (
        pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            "id_a",
            "id_b",
            (c / (F.col("__na") + F.col("__nb") - c)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
