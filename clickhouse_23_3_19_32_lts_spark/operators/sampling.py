"""SAMPLE clause.

Reference: sampling-key range arithmetic in
src/Storages/MergeTree/MergeTreeDataSelectExecutor.cpp:496-610 — SAMPLE k
restricts the sampling key's hash range so repeated queries see the same
deterministic subset.

Spark: hash-range predicate on a sampling expression — deterministic like
the reference (same rows every run), pushdown-friendly, no RNG state. Also
exposes TABLESAMPLE semantics via df.sample for the probabilistic form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BUCKETS = 1 << 32
_PORTABLE_BUCKETS = 1 << 60


def sample_deterministic(
    df: DataFrame, fraction: float, key: str | Column, portable: bool = False
) -> DataFrame:
    """SAMPLE <fraction> over a sampling key: keep rows whose key hash falls
    in [0, fraction * 2^N) — reference semantics (same subset every query,
    sub-ranges compose: SAMPLE 0.1 ⊂ SAMPLE 0.2).

    portable=False (default): 32-bit xxhash64 range — pure codegen, fastest.
    portable=True: 60-bit md5-hex-prefix hash, bit-identical to
    `CAST(('0x' || substr(md5(k::VARCHAR),1,15)) AS BIGINT)` in DuckDB/ANSI
    engines, so the sample is oracle-reproducible across engines.
    """
    if not (0 < fraction <= 1):
        raise ValueError("fraction in (0, 1]")
    k = F.col(key) if isinstance(key, str) else key
    if portable:
        h = F.conv(F.substring(F.md5(k.cast("string")), 1, 15), 16, 10).cast("long")
        return df.filter(h < int(fraction * _PORTABLE_BUCKETS))
    h = F.pmod(F.xxhash64(k), F.lit(_HASH_BUCKETS))
    return df.filter(h < int(fraction * _HASH_BUCKETS))


def sample_probabilistic(df: DataFrame, fraction: float, seed: int | None = None) -> DataFrame:
    """TABLESAMPLE (n PERCENT) — Bernoulli row sample."""
    return df.sample(fraction=fraction, seed=seed if seed is not None else 42)
