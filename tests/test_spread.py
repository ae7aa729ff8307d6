"""Unit tests for pipeline/spread.py guard hardening and the engine
read-path memos (round-10 VERDICT items 7/8 + ADVICE fixes)."""

from __future__ import annotations

import os
import shutil

import pytest

from clickhouse_23_3_19_32_lts_spark.engine import read_parquet_table
from clickhouse_23_3_19_32_lts_spark.pipeline.spread import (
    _estimated_scan_tasks,
    _parse_bytes,
    spread,
)


def test_parse_bytes_forms():
    assert _parse_bytes("134217728") == 128 * 1024 * 1024
    assert _parse_bytes("134217728b") == 128 * 1024 * 1024
    assert _parse_bytes("128m") == 128 * 1024 * 1024
    assert _parse_bytes("128MB") == 128 * 1024 * 1024
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("64k") == 64 * 1024
    # unrecognized input -> numeric default, never an exception
    assert _parse_bytes("whatever") == 128 * 1024 * 1024


def test_spread_inmemory_already_parallel_is_noop(spark):
    """df.inputFiles() is [] for in-memory sources; the guard must fall back
    to the exact partition count instead of unconditionally re-shuffling an
    already-parallel input (round-9 ADVICE)."""
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, target + 2)
    out = spread(df, "id")
    assert out is df  # untouched: no repartition node added


def test_spread_inmemory_narrow_is_repartitioned(spark):
    target = spark.sparkContext.defaultParallelism
    if target <= 1:
        pytest.skip("needs parallelism > 1")
    df = spark.range(0, 1000, 1, 1)
    out = spread(df, "id")
    assert out is not df
    assert out.rdd.getNumPartitions() == target


def test_estimated_scan_tasks_early_exit(spark, sf_dir):
    df = read_parquet_table(spark, os.path.join(sf_dir, "lineitem.parquet"))
    # target=1: must return >= 1 immediately without walking every file
    assert _estimated_scan_tasks(df, 1) >= 1
    # empty-file-list inputs raise (caller falls back to partition count)
    with pytest.raises(Exception):
        _estimated_scan_tasks(spark.range(10), 8)


def test_read_memo_reinfers_on_rewrite(spark, sf_dir, tmp_path):
    """The schema/DF memos key on the file stat: rewriting the file (new
    mtime/size) must re-infer — never serve the stale handle."""
    src = os.path.join(sf_dir, "region.parquet")
    p = str(tmp_path / "t.parquet")
    shutil.copyfile(src, p)
    df1 = read_parquet_table(spark, p)
    assert read_parquet_table(spark, p) is df1  # stat unchanged -> same handle
    # rewrite with different content (nation has a different schema)
    shutil.copyfile(os.path.join(sf_dir, "nation.parquet"), p)
    os.utime(p, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    df2 = read_parquet_table(spark, p)
    assert df2 is not df1
    assert df2.schema != df1.schema


def test_read_memo_directory_part_rewrite(spark, sf_dir, tmp_path):
    """Directory tables: an in-place rewrite of a contained part file need
    not change the directory stat — the key folds in the newest part stat
    (round-9 VERDICT item 8)."""
    d = tmp_path / "tbl"
    d.mkdir()
    shutil.copyfile(os.path.join(sf_dir, "region.parquet"), d / "part-0.parquet")
    os.utime(d, ns=(3, 3))  # pin the dir stat: only the part stat may differ
    df1 = read_parquet_table(spark, str(d))
    shutil.copyfile(os.path.join(sf_dir, "nation.parquet"), d / "part-0.parquet")
    os.utime(d / "part-0.parquet", ns=(2, 2))
    os.utime(d, ns=(3, 3))
    df2 = read_parquet_table(spark, str(d))
    assert df2 is not df1
    assert df2.schema != df1.schema
