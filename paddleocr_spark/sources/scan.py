"""Memoized parquet relation factory for the fixed corpus tables.

`spark.read.parquet(path)` costs ~0.3 s of driver time per call (schema
read + FileIndex listing over py4j) — and the union suites reference the
same `documents.parquet` from dozens of branch builders, so relation
creation alone was ~10 s of every suite build at sf0.1. DataFrames are
immutable, so handing every caller the SAME relation object is free and
changes no plan (Catalyst prunes columns per consumer exactly as
before).

Keyed by (path, mtime) and stored ON the session object, so a rewritten
table is never served stale and the cache dies with its session. Only
the read-only corpus tables go through here — job outputs that a run
rewrites mid-session keep calling spark.read.parquet directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_ATTR = "_spark_graft_scan_cache"


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    try:
        # full-resolution mtime: second-truncation could serve a stale
        # relation to a caller that rewrites the same path sub-second
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = 0.0  # globs / remote paths: fall back to path-only keying
    key = (path, mtime)
    cache = spark.__dict__.setdefault(_ATTR, {})
    if key not in cache:
        cache[key] = spark.read.parquet(path)
    return cache[key]
