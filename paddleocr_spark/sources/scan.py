"""Memoized parquet relation factory for the fixed corpus tables.

`spark.read.parquet(path)` costs ~0.3 s of driver time per call (schema
read + FileIndex listing over py4j) — and the union suites reference the
same `documents.parquet` from dozens of branch builders, so relation
creation alone was ~10 s of every suite build at sf0.1. DataFrames are
immutable, so handing every caller the SAME relation object is free and
changes no plan (Catalyst prunes columns per consumer exactly as
before).

One live relation per path, keyed by full-resolution mtime and stored ON
the session object: a rewritten table evicts its stale predecessor (no
unbounded growth across rewrite loops) and the cache dies with its
session. Creation is double-check locked — the suite builders call this
from a thread pool, and an unsynchronized check-then-act would hand
concurrent cold-cache branches different relation objects, silently
losing the sharing. Only the read-only corpus tables go through here —
job outputs that a run rewrites mid-session keep calling
spark.read.parquet directly.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession

_ATTR = "_spark_graft_scan_cache"
_LOCK = threading.Lock()


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    try:
        # full-resolution mtime: second-truncation could serve a stale
        # relation to a caller that rewrites the same path sub-second
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = 0.0  # globs / remote paths: fall back to path-only keying
    cache = spark.__dict__.setdefault(_ATTR, {})
    hit = cache.get(path)  # dict reads are atomic under the GIL
    if hit is not None and hit[0] == mtime:
        return hit[1]
    with _LOCK:
        hit = cache.get(path)
        if hit is not None and hit[0] == mtime:
            return hit[1]
        frame = spark.read.parquet(path)
        cache[path] = (mtime, frame)
        return frame
