"""Snapshot store: append/read, time travel, lineage resume, retention
delete, atomicity against torn manifests."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from newsraag_crawler_spark.storage.snapshot_store import SnapshotTable


def test_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    assert not t.exists()
    t.append(spark.range(5).withColumn("wave", F.lit(0)), lineage={"wave": 0})
    t.append(spark.range(5, 8).withColumn("wave", F.lit(1)), lineage={"wave": 1})
    assert t.current_version() == 2
    assert t.read().count() == 8
    assert t.read(version=1).count() == 5  # time travel
    assert t.current_lineage() == {"wave": 1}


def test_resume_from_lineage(spark, tmp_path):
    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    t.append(spark.range(10), lineage={"wave": 3, "frontier_offset": 1000})
    # simulate a fresh process resuming
    t2 = SnapshotTable(spark, path)
    lin = t2.current_lineage()
    assert lin["wave"] == 3 and lin["frontier_offset"] == 1000
    assert t2.read().count() == 10


def test_overwrite_compaction(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(10))
    t.overwrite(spark.range(3), lineage={"op": "compact"})
    assert t.read().count() == 3
    assert t.read(version=1).count() == 10  # history preserved


def test_delete_where_retention(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(10).withColumn("age_h", F.col("id").cast("double")))
    t.delete_where(F.col("age_h") > 5.0)
    assert t.read().count() == 6  # 0..5 kept


def test_torn_manifest_invisible(spark, tmp_path):
    """A crash mid-snapshot (data written, manifest not committed) must leave
    the previous version intact and the new data invisible."""
    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path)
    t.append(spark.range(4), lineage={"wave": 0})
    # write a data dir WITHOUT committing the manifest (simulated crash)
    spark.range(100).write.mode("overwrite").parquet(os.path.join(path, "snap-00099"))
    assert t.read().count() == 4
    assert t.current_version() == 1
    # manifest is valid json (no partial writes)
    with open(os.path.join(path, "manifest.json")) as f:
        m = json.load(f)
    assert m["current"] == 1


def test_delete_where_retains_null_condition_rows(spark, tmp_path):
    """delete_where must keep rows where the condition is NULL (SQL NULL is
    neither true nor false; plain ~cond would silently drop them)."""
    from pyspark.sql import Row

    from newsraag_crawler_spark.storage.snapshot_store import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "nullsafe"))
    t.append(
        spark.createDataFrame(
            [Row(k=1, age=10), Row(k=2, age=None), Row(k=3, age=99)]
        )
    )
    from pyspark.sql import functions as F

    t.delete_where(F.col("age") > 50)
    kept = {r.k for r in t.read().collect()}
    assert kept == {1, 2}, "NULL-age row must survive a retention delete"


def test_rollback_drops_orphaned_snapshot_entries(spark, tmp_path):
    """rollback_where must REMOVE orphaned higher-id manifest entries: the
    next append reuses sid = current+1, and a duplicate-id entry would make
    read()/current_lineage() resolve to the stale orphan."""
    t = SnapshotTable(spark, str(tmp_path / "rb"))
    t.append(spark.range(3).withColumn("wave", F.lit(0)), lineage={"wave": 0})
    t.append(spark.range(3, 5).withColumn("wave", F.lit(1)), lineage={"wave": 1})
    t.append(spark.range(5, 9).withColumn("wave", F.lit(2)), lineage={"wave": 2})
    assert t.rollback_where(lambda lin: lin["wave"] < 1) == 1
    m = json.load(open(os.path.join(t.path, "manifest.json")))
    assert [s["id"] for s in m["snapshots"]] == [1]
    assert not os.path.isdir(os.path.join(t.path, "snap-00002"))
    # re-append with the reused sid: lineage/read must resolve to the NEW entry
    t.append(spark.range(100, 102).withColumn("wave", F.lit(1)), lineage={"wave": 1, "redo": True})
    assert t.current_lineage() == {"wave": 1, "redo": True}
    got = sorted(r.id for r in t.read().collect())
    assert got == [0, 1, 2, 100, 101]
    m = json.load(open(os.path.join(t.path, "manifest.json")))
    ids = [s["id"] for s in m["snapshots"]]
    assert len(ids) == len(set(ids))
