"""Iceberg-style snapshot layer: atomic commit, crash invisibility,
time travel, watermark resume, concurrent-commit retry, expiry.

These pin the production resume contract from BASELINE.json's
north_star ("resumes idempotently from the last committed snapshot",
"per-partition lineage + throughput metrics to an Iceberg audit
table"): a crashed run's durable-but-uncommitted files must never be
visible, and results + audit must appear in ONE atomic commit.
"""

import json
import os

from conftest import SF_SMALL

from paddleocr_spark.plans import snapshots as snap
from paddleocr_spark.sources.pages import pages_from_documents


def _mini(spark, lo, hi):
    return spark.range(lo, hi).select(
        (snap.F.concat(snap.F.lit("u"), snap.F.col("id"))).alias("url"),
        snap.F.col("id").cast("double").alias("score"),
    )


def test_append_read_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = snap.append(_mini(spark, 0, 3), root)
    v2 = snap.append(_mini(spark, 3, 6), root)
    assert (v1, v2) == (1, 2)
    assert snap.read(spark, root).count() == 6
    assert snap.read(spark, root, version=1).count() == 3
    m = snap.load_snapshot(root)
    assert m["parent"] == 1 and m["version"] == 2
    # manifest carries footer stats usable for pruning
    files = m["branches"]["results"]["files"]
    assert all(f["rows"] > 0 and f["bytes"] > 0 for f in files)


def test_crashed_writer_files_invisible_and_resumed(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snap.append(_mini(spark, 0, 2), root)
    # simulate a crash: data files written durably, commit never happened
    snap._write_branch(_mini(spark, 2, 4), root, "results")
    assert snap.read(spark, root).count() == 2  # orphans invisible
    todo = snap.resume_filter_exact(_mini(spark, 0, 4), root)
    # the crashed run's urls are re-extracted exactly once
    assert sorted(r["url"] for r in todo.collect()) == ["u2", "u3"]


def test_concurrent_commit_retries_metadata_only(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snap.append(_mini(spark, 0, 2), root)
    branch = snap._write_branch(_mini(spark, 2, 4), root, "results")
    # another committer wins version 2 mid-flight
    winner = snap._snap_path(root, 2)
    os.makedirs(snap._meta_dir(root), exist_ok=True)
    base = snap.load_snapshot(root, 1)
    base["version"], base["parent"] = 2, 1
    with open(winner, "w", encoding="utf-8") as fh:
        json.dump(base, fh)
    v = snap.commit(root, {"results": branch})
    assert v == 3  # loser retried on top of the winner
    assert snap.read(spark, root).count() == 4


def test_run_job_snapshot_atomic_and_idempotent(spark, tmp_path):
    root = str(tmp_path / "tbl")
    pages = pages_from_documents(spark, SF_SMALL, limit=10).cache()
    out1 = snap.run_job_snapshot(
        spark, pages.limit(6), root, num_partitions=4, run_id="s1"
    )
    assert out1["version"] == 1 and out1["rows"] == 6
    m = snap.load_snapshot(root)
    # ONE commit published results AND audit together
    assert set(m["branches"]) == {"results", "audit"}
    assert snap.read(spark, root, "audit").count() >= 1
    out2 = snap.run_job_snapshot(spark, pages, root, num_partitions=4, run_id="s2")
    assert out2["rows"] == 4
    res = snap.read(spark, root)
    assert res.count() == 10
    assert res.select("url").distinct().count() == 10
    # audit is incremental: run s2's rows count only its own 4 pages
    audit = snap.read(spark, root, "audit")
    s2 = audit.filter("run_id = 's2'").agg({"page_count": "sum"}).collect()[0][0]
    assert s2 == 4
    # fully-committed input: no-op, no empty snapshot
    out3 = snap.run_job_snapshot(spark, pages, root, num_partitions=4, run_id="s3")
    assert out3 == {"version": 2, "rows": 0, "run_id": "s3"}
    assert snap.current_version(root) == 2
    pages.unpersist()


def test_watermark_resume(spark, tmp_path):
    root = str(tmp_path / "tbl")
    pages = pages_from_documents(spark, SF_SMALL, limit=8).cache()
    split = pages.selectExpr("percentile(unix_timestamp(warc_ts), 0.5) p").collect()[0]["p"]
    early = pages.filter(snap.F.unix_timestamp("warc_ts") <= split)
    late = pages.filter(snap.F.unix_timestamp("warc_ts") > split)
    n_late = late.count()
    assert 0 < n_late < 8
    snap.run_job_snapshot(spark, early, root, num_partitions=2, run_id="w1")
    wm = snap.watermark(root)
    assert wm is not None
    todo = snap.resume_filter_watermark(pages, root)
    assert todo.count() == n_late  # O(1)-metadata incremental resume
    out = snap.run_job_snapshot(
        spark, pages, root, num_partitions=2, run_id="w2", exact=False
    )
    assert out["rows"] == n_late
    assert snap.read(spark, root).select("url").distinct().count() == 8
    pages.unpersist()


def test_file_pruning_by_url_stats(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snap.append(_mini(spark, 0, 1), root)  # only u0
    snap.append(_mini(spark, 1, 3), root)  # u1,u2
    all_files = snap.load_snapshot(root)["branches"]["results"]["files"]
    hit = snap.prune_files(root, "u0", "u0")
    assert len(hit) < len(all_files)
    assert sum(f["rows"] for f in hit) == 1


def test_expire_snapshots_keeps_live_state(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for k in range(3):
        snap.append(_mini(spark, 3 * k, 3 * (k + 1)), root)
    # plus an orphan from a crashed run
    snap._write_branch(_mini(spark, 100, 101), root, "results")
    deleted = snap.expire_snapshots(root, keep_last=1)
    assert deleted  # old manifests + the orphan went away
    assert snap.current_version(root) == 3
    assert snap.read(spark, root).count() == 9  # live state intact
    assert not os.path.exists(snap._snap_path(root, 1))


def test_compaction_rewrite_and_conflict(spark, tmp_path):
    """Compaction replaces many small files with few, preserves rows,
    keeps time travel intact, and REFUSES to publish over a concurrent
    append (rewrite-conflict validation)."""
    root = str(tmp_path / "tbl")
    snap.append(_mini(spark, 0, 3), root)
    snap.append(_mini(spark, 3, 6), root)
    before = snap.load_snapshot(root)["branches"]["results"]["files"]
    assert len(before) > 1
    v = snap.compact(spark, root, target_files=1)
    assert v == 3
    after = snap.load_snapshot(root)["branches"]["results"]["files"]
    assert len(after) == 1
    assert snap.read(spark, root).count() == 6
    # pre-compaction state still readable (time travel)
    assert snap.read(spark, root, version=2).count() == 6
    assert {f["path"] for f in snap.load_snapshot(root, 2)["branches"][
        "results"]["files"]} == {f["path"] for f in before}
    # conflict: append lands between the rewrite's read and publish
    consumed = [f["path"] for f in after]
    new_branch = snap._write_branch(_mini(spark, 6, 7), root, "results")
    snap.append(_mini(spark, 7, 8), root)  # the concurrent append wins
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="rewrite conflict"):
        snap.commit(
            root, {"results": new_branch}, replace={"results"},
            expect_files={"results": consumed},
        )
    assert snap.read(spark, root).count() == 7  # append intact, rewrite dropped


def test_compaction_noop_below_min_files(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snap.append(_mini(spark, 0, 2).coalesce(1), root)
    assert snap.compact(spark, root) is None
    assert snap.current_version(root) == 1


def test_read_changes_incremental_consumption(spark, tmp_path):
    """A downstream consumer reads only the rows appended after the
    version it last processed; compaction rewrites are never re-seen;
    an expired chain raises instead of silently replaying."""
    import pytest as _pytest

    root = str(tmp_path / "tbl")
    snap.append(_mini(spark, 0, 3), root)  # v1: +3 rows
    snap.append(_mini(spark, 3, 6), root)  # v2: +3 rows
    v3 = snap.compact(spark, root, target_files=1)  # v3: rewrite, +0
    snap.append(_mini(spark, 6, 8), root)  # v4: +2 rows

    assert snap.read_changes(spark, root, 0).count() == 8
    got = snap.read_changes(spark, root, 1)
    assert sorted(r["url"] for r in got.collect()) == [
        "u3", "u4", "u5", "u6", "u7"
    ]
    assert snap.read_changes(spark, root, 2).count() == 2
    assert snap.read_changes(spark, root, v3).count() == 2
    # only the rewrite between the endpoints -> empty, schema intact
    ch = snap.read_changes(spark, root, 2, to_version=v3)
    assert ch.count() == 0 and ch.columns == ["url", "score"]
    # from == to -> empty delta
    assert snap.read_changes(spark, root, 4, to_version=4).count() == 0
    with _pytest.raises(ValueError, match="from_version"):
        snap.read_changes(spark, root, 5, to_version=4)

    # expire the early snapshots: the truncated chain must refuse
    # (diffing v4 needs v3's manifest, so keep the last two)
    snap.expire_snapshots(root, keep_last=2)
    with _pytest.raises(RuntimeError, match="changelog unavailable"):
        snap.read_changes(spark, root, 0)
    # ...but a delta entirely inside the kept window still works
    assert snap.read_changes(spark, root, v3).count() == 2


def test_schema_evolution_add_column(spark, tmp_path):
    """An append may ADD columns (readers null-fill older files); drops
    and retypes are refused; time travel keeps each version's schema."""
    import pytest as _pytest

    root = str(tmp_path / "tbl")
    snap.append(_mini(spark, 0, 3), root)
    snap.append(
        _mini(spark, 3, 5).withColumn("lang", snap.F.lit("en")), root
    )
    got = snap.read(spark, root)
    assert got.columns == ["url", "score", "lang"]
    langs = {r["url"]: r["lang"] for r in got.collect()}
    assert langs["u0"] is None and langs["u3"] == "en"
    # the evolved schema flows through the changelog too
    assert snap.read_changes(spark, root, 1).columns == [
        "url", "score", "lang"
    ]
    # dropping an existing column is refused (orphan files stay
    # invisible: the table is unchanged)
    v_before = snap.current_version(root)
    with _pytest.raises(ValueError, match="schema evolution"):
        snap.append(_mini(spark, 5, 6).drop("score"), root)
    with _pytest.raises(ValueError, match="schema evolution"):
        snap.append(
            _mini(spark, 5, 6).withColumn(
                "score", snap.F.col("score").cast("string")
            ),
            root,
        )
    assert snap.current_version(root) == v_before
    assert snap.read(spark, root).count() == 5
    # time travel: v1 still presents the pre-evolution schema
    assert snap.read(spark, root, version=1).columns == ["url", "score"]


def test_expire_snapshots_on_missing_table_is_noop(tmp_path):
    """--maintain --expire-keep on a mistyped/empty root must not crash
    (compact already tolerates it; expire must match)."""
    assert snap.expire_snapshots(str(tmp_path / "nope"), keep_last=2) == []


def test_dedup_incremental_against_committed(spark, tmp_path):
    """The per-epoch composition: a new batch is deduped within itself
    (min url wins) and against every committed snapshot, so replayed or
    recrawled content never lands twice."""
    from paddleocr_spark.functions.dedup import dedup_incremental

    root = str(tmp_path / "tbl")

    def batch(rows):
        return spark.createDataFrame(
            rows, "url string, extracted_text string"
        )

    # epoch 1 on an EMPTY table: intra-batch dup collapses to min url
    b1 = batch([("u2", "HELLO WORLD"), ("u1", "hello, world!"),
                ("u3", "unique one")])
    s1 = dedup_incremental(spark, b1, root)
    assert sorted(r.url for r in s1.collect()) == ["u1", "u3"]
    snap.append(s1, root)

    # epoch 2: one replayed doc (same content, new url), one new
    b2 = batch([("u9", "HELLO... world"), ("u4", "fresh content")])
    s2 = dedup_incremental(spark, b2, root)
    assert [r.url for r in s2.collect()] == ["u4"]
    snap.append(s2, root)
    assert snap.read(spark, root).count() == 3


def _cap(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts long, text string"
    )


def test_merge_latest_upsert_semantics(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = snap.append(
        _cap(spark, [("a", 10, "a-old"), ("b", 10, "b0"), ("c", 10, "c0")]),
        root,
    )
    v2 = snap.merge_latest(
        spark,
        _cap(spark, [("a", 20, "a-new"), ("d", 5, "d0"), ("b", 3, "b-stale")]),
        root,
    )
    assert v2 == v1 + 1
    got = {
        r["url"]: (r["warc_ts"], r["text"])
        for r in snap.read(spark, root).collect()
    }
    assert got == {
        "a": (20, "a-new"),   # newer capture wins
        "b": (10, "b0"),      # stale incoming loses
        "c": (10, "c0"),      # untouched carries over
        "d": (5, "d0"),       # brand-new key inserts
    }
    # time travel still shows the pre-merge state
    old = {
        r["url"]: r["text"]
        for r in snap.read(spark, root, version=v1).collect()
    }
    assert old == {"a": "a-old", "b": "b0", "c": "c0"}


def test_merge_latest_tie_goes_to_incoming(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snap.append(_cap(spark, [("a", 10, "old")]), root)
    snap.merge_latest(spark, _cap(spark, [("a", 10, "refetch")]), root)
    got = snap.read(spark, root).collect()
    assert [(r["url"], r["text"]) for r in got] == [("a", "refetch")]


def test_merge_latest_is_content_idempotent(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snap.append(_cap(spark, [("a", 10, "x"), ("b", 11, "y")]), root)
    batch = _cap(spark, [("a", 20, "x2")])
    snap.merge_latest(spark, batch, root)
    first = sorted(map(tuple, snap.read(spark, root).collect()))
    snap.merge_latest(spark, batch, root)
    second = sorted(map(tuple, snap.read(spark, root).collect()))
    assert first == second


def test_merge_latest_conflicts_with_concurrent_append(spark, tmp_path):
    import pytest as _pytest

    root = str(tmp_path / "tbl")
    snap.append(_cap(spark, [("a", 10, "x")]), root)
    # simulate a writer landing between the merge's read and commit:
    # grab the file list the merge would consume, append, then commit
    # the rewrite against the stale expectation
    b = snap.load_snapshot(root)["branches"]["results"]
    consumed = [f["path"] for f in b["files"]]
    snap.append(_cap(spark, [("z", 1, "zz")]), root)
    merged = _cap(spark, [("a", 20, "x2")])
    with _pytest.raises(RuntimeError, match="rewrite conflict"):
        snap.commit(
            root,
            {"results": snap._write_branch(merged, root, "results")},
            {},
            replace={"results"},
            expect_files={"results": consumed},
        )


def test_merge_latest_empty_table_bootstraps(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v = snap.merge_latest(spark, _cap(spark, [("a", 1, "x")]), root)
    assert v == 1
    assert [r["url"] for r in snap.read(spark, root).collect()] == ["a"]
