"""Snapshot-committed table store with per-partition lineage.

Emulates the Iceberg table semantics the engine needs (north_rule: resumable
from snapshot checkpoints with per-partition lineage) on plain parquet +
an atomically-replaced JSON manifest:

    table_dir/
      manifest.json                 <- {"current": N, "snapshots": [...]}
      snap-00001/part-*.parquet     <- data files added by snapshot 1
      snap-00002/...

- A snapshot = the list of data directories visible at that version plus a
  ``lineage`` dict (wave number, row counts, seen-shard parameters, anything
  the caller records). Readers read ONLY directories listed in the current
  manifest entry — a crashed half-written snapshot directory is invisible,
  so commits are atomic (write dirs → fsync manifest.tmp → os.replace).
- ``append`` adds files; ``overwrite`` starts a new file list (used by the
  compacted ``seen`` table); ``read(version=...)`` is time travel; resume =
  ``current_lineage()`` after a crash.

On a real cluster this module is replaced 1:1 by an Iceberg catalog
(``df.writeTo(tbl).append()`` + snapshot summary properties); the engine
code only touches this narrow interface, deliberately.

Lineage schema per table (r4 VERDICT #9 — the resume contract; writers
MUST record these keys or run_crawl's resume refuses loudly instead of
silently restarting at wave 0):

===========  ==============================================================
table        required lineage keys (written by operators.wave.run_crawl)
===========  ==============================================================
frontier     ``next_wave`` (int: the wave the next run executes — THE
             resume key), ``prev_fetched`` (int), ``rows`` (int, recorded
             by count_rows=True so the loop never re-probes emptiness)
corpus       ``wave`` (int: the wave that appended this snapshot — the
             rollback predicate for torn waves), ``rows`` (int)
seen         ``wave`` (int, rollback predicate)
metrics      ``wave`` (int, rollback predicate)
dead         ``wave`` (int, rollback predicate) — optional table
health       ``wave`` (int, rollback predicate) — optional table
===========  ==============================================================

Streaming (frontier_stream.stream_crawl) writes ``batch_id`` + ``op``
instead — its resume point is the Structured Streaming checkpoint, not
table lineage. The bench/state tables (bloom shards etc.) are free-form.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def _load(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"current": 0, "snapshots": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)

    # -- public API ---------------------------------------------------------

    def current_version(self) -> int:
        return self._load()["current"]

    def current_lineage(self) -> dict | None:
        m = self._load()
        for s in m["snapshots"]:
            if s["id"] == m["current"]:
                return s["lineage"]
        return None

    def _write_snapshot(
        self,
        df: DataFrame | None,
        base_dirs: list[str],
        lineage: dict,
        count_rows: bool = False,
    ) -> int:
        m = self._load()
        sid = m["current"] + 1
        dirs = list(base_dirs)
        if df is not None:
            snap_dir = os.path.join(self.path, f"snap-{sid:05d}")
            df.write.mode("overwrite").parquet(snap_dir)
            if count_rows:
                # metadata-only count from parquet footers of the files just
                # written — records rows in lineage WITHOUT re-executing the
                # (possibly expensive) plan that produced df
                lineage = {
                    **lineage,
                    "rows": int(self.spark.read.parquet(snap_dir).count()),
                }
            dirs.append(f"snap-{sid:05d}")
        m["snapshots"].append({"id": sid, "dirs": dirs, "lineage": lineage})
        m["current"] = sid
        self._commit(m)
        return sid

    def append(
        self, df: DataFrame, lineage: dict | None = None, count_rows: bool = False
    ) -> int:
        """Append df as a new snapshot (prior data remains visible).

        count_rows=True records the written row count in lineage["rows"],
        counted from the committed files (one plan execution total)."""
        m = self._load()
        cur = next((s for s in m["snapshots"] if s["id"] == m["current"]), None)
        base = cur["dirs"] if cur else []
        return self._write_snapshot(df, base, lineage or {}, count_rows)

    def overwrite(
        self, df: DataFrame, lineage: dict | None = None, count_rows: bool = False
    ) -> int:
        """Replace table contents (compaction / rewrite)."""
        return self._write_snapshot(df, [], lineage or {}, count_rows)

    def delete_where(self, condition, lineage: dict | None = None) -> int:
        """Retention delete (reference K3): rewrite rows NOT matching the
        condition as a fresh snapshot. With real Iceberg this is a metadata
        delete on partition-pruned files. NULL-condition rows are RETAINED
        (plain ~cond drops them: NULL is neither true nor false in SQL)."""
        from pyspark.sql import functions as F

        kept = self.read().filter(~F.coalesce(condition, F.lit(False)))
        return self.overwrite(kept, lineage or {"op": "delete_where"})

    def rollback_where(self, pred) -> int:
        """Reset current to the latest snapshot whose lineage satisfies
        ``pred`` (or to empty if none does). Used by crash recovery to drop
        orphaned commits from a wave whose frontier commit never landed.

        Orphaned entries with id > the new current are REMOVED from the
        manifest (and their snap directories deleted): the next append reuses
        sid = current + 1, and duplicate-id entries would make read()/
        current_lineage() resolve to the stale orphan."""
        m = self._load()
        target = 0
        for s in reversed(m["snapshots"]):
            if s["id"] <= m["current"] and pred(s["lineage"]):
                target = s["id"]
                break
        if target == m["current"]:
            return target
        orphans = [s for s in m["snapshots"] if s["id"] > target]
        m["snapshots"] = [s for s in m["snapshots"] if s["id"] <= target]
        m["current"] = target
        self._commit(m)
        # reclaim orphan data dirs AFTER the manifest commit (readers only see
        # manifest-listed dirs, so this is pure cleanup; each snapshot's own
        # data lives in its snap-{id} dir — earlier dirs in its list are bases)
        import shutil

        for s in orphans:
            d = os.path.join(self.path, f"snap-{s['id']:05d}")
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
        return target

    def read(self, version: int | None = None) -> DataFrame:
        m = self._load()
        sid = version if version is not None else m["current"]
        snap = next((s for s in m["snapshots"] if s["id"] == sid), None)
        if snap is None or not snap["dirs"]:
            raise ValueError(f"no snapshot {sid} in {self.path}")
        paths = [os.path.join(self.path, d) for d in snap["dirs"]]
        return self.spark.read.parquet(*paths)

    def exists(self) -> bool:
        m = self._load()
        return m["current"] > 0
