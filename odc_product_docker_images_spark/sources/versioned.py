"""Versioned-manifest table format (SURVEY.md §1 "Delta-style partitioned
Parquet as the canonical storage").

A minimal transaction-log table layout demonstrating the three properties
the reference's plain file trees lack and a 100 TB lakehouse needs:

- **Snapshot isolation / time travel**: every commit writes an immutable
  manifest ``_manifest/v{N}.json`` listing the EXACT data files of that
  snapshot; readers plan from a manifest, never from directory listing, so
  a concurrent writer can't tear a read and old versions stay readable.
- **Atomic commit**: the manifest is written to a temp name and renamed —
  readers see v(N) or v(N+1), nothing in between (single-FS rename
  atomicity; object stores use put-if-absent for the same effect).
- **Compaction without breaking history**: small files are rewritten into
  few large ones as a NEW snapshot whose manifest drops the old files;
  previous manifests still reference them, so time travel survives until
  an explicit vacuum.

This is deliberately the mechanics of Delta/Iceberg in ~100 lines — at
production scale you'd adopt one of those formats wholesale; the engine
keeps the same read/write API either way.  O(1) planning: a scan reads one
JSON manifest instead of listing O(files) directories.
"""

from __future__ import annotations

import json
import os
import uuid
from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dsum, sql_dsum
from ..io import load
from ..registry import register


class VersionedTable:
    """A directory with ``data/`` parquet files + ``_manifest/v{N}.json``."""

    def __init__(self, path: str) -> None:
        self.path = Path(path)
        self.manifest_dir = self.path / "_manifest"
        self.data_dir = self.path / "data"

    # -- log ---------------------------------------------------------------

    def versions(self) -> list[int]:
        if not self.manifest_dir.is_dir():
            return []
        return sorted(
            int(p.stem[1:]) for p in self.manifest_dir.glob("v*.json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        return json.loads((self.manifest_dir / f"v{version}.json").read_text())

    def snapshot_files(self, version: int | None = None) -> list[str]:
        if version is None:
            version = self.latest_version()
        if version is None:
            return []
        return [str(self.path / f) for f in self._manifest(version)["files"]]

    def _commit(self, files: list[str], operation: str) -> int:
        """Atomically publish a new snapshot listing ``files`` (relative)."""
        self.manifest_dir.mkdir(parents=True, exist_ok=True)
        new_v = (self.latest_version() or 0) + 1 if self.versions() else 0
        manifest = {"version": new_v, "operation": operation, "files": sorted(files)}
        tmp = self.manifest_dir / f".v{new_v}.json.{uuid.uuid4().hex[:8]}"
        tmp.write_text(json.dumps(manifest, indent=1))
        os.rename(tmp, self.manifest_dir / f"v{new_v}.json")  # the commit point
        return new_v

    # -- write paths -------------------------------------------------------

    def _write_data(self, df: DataFrame, n_files: int | None) -> list[str]:
        """Write df's rows as fresh parquet files; return repo-relative names."""
        out = self.data_dir / uuid.uuid4().hex[:12]
        if n_files:
            # repartition, not coalesce: the contract is EXACTLY n_files
            # (coalesce can only merge, so a single-split source would yield
            # one file regardless).  Production compaction of huge tables
            # would prefer coalesce to skip the shuffle when only merging.
            df = df.repartition(n_files)
        df.write.mode("overwrite").parquet(str(out))
        return [
            str(p.relative_to(self.path))
            for p in out.glob("*.parquet")
            if p.is_file()
        ]

    def write(self, df: DataFrame, mode: str = "append", n_files: int | None = None) -> int:
        new_files = self._write_data(df, n_files)
        if mode == "append" and self.latest_version() is not None:
            prev = self._manifest(self.latest_version())["files"]
            new_files = list(prev) + new_files
        elif mode != "append" and mode != "overwrite":
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        return self._commit(new_files, mode)

    def compact(self, spark: SparkSession, n_files: int = 1) -> int:
        """Rewrite the LATEST snapshot into ``n_files`` files as a new
        version.  Old files stay on disk — older snapshots still plan them."""
        new_files = self._write_data(self.read(spark), n_files)
        return self._commit(new_files, "compact")

    def merge(self, spark: SparkSession, updates: DataFrame, key: str) -> int:
        """MERGE (upsert) by ``key`` with file-level copy-on-write — the
        Delta ``MERGE INTO`` analog, and the reference's "reprocessed scene
        replaces the indexed dataset" semantics.

        Only data files that CONTAIN a matched key are rewritten; untouched
        files are carried into the new manifest verbatim (at 100 TB a merge
        touching 0.1% of keys rewrites ~0.1% of well-clustered files, not
        the table).  Matched rows are replaced by their update row, new
        keys are appended.  Assumes ``key`` is unique in the snapshot.
        """
        current = self.read(spark)
        # Which files hold a matched key?  File names are snapshot METADATA
        # (bounded by file count, never row count) — collecting them is the
        # same driver-side planning every table format's MERGE does.
        touched_rows = (
            current.withColumn("_f", F.input_file_name())
            .join(updates.select(key).hint("broadcast"), key, "left_semi")
        )
        touched = {
            r["_f"] for r in touched_rows.select("_f").distinct().collect()  # metadata-only
        }
        prev = self._manifest(self.latest_version())["files"]
        untouched = [f for f in prev if not any(t.endswith(f) for t in touched)]
        if touched:
            keep = (
                spark.read.parquet(*[str(self.path / f) for f in prev if any(
                    t.endswith(f) for t in touched)])
                .join(updates.select(key), key, "left_anti")
            )
            rewritten = keep.unionByName(updates)
        else:
            rewritten = updates
        new_files = self._write_data(rewritten, n_files=None)
        return self._commit(untouched + new_files, "merge")

    # -- read path ---------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        files = self.snapshot_files(version)
        if not files:
            raise ValueError(f"no snapshot at version={version!r} in {self.path}")
        return spark.read.parquet(*files)

    def file_count(self, version: int | None = None) -> int:
        return len(self.snapshot_files(version))


def _fresh_table(prefix: str) -> VersionedTable:
    base = Path(__file__).resolve().parents[2] / ".tmp" / f"{prefix}_{uuid.uuid4().hex[:8]}"
    return VersionedTable(str(base))


@register(
    "table_time_travel",
    oracle=f"""
        SELECT CAST(0 AS INTEGER) AS version, COUNT(*) AS n_rows,
               {sql_dsum("l_quantity", "sum_qty")}
        FROM lineitem WHERE YEAR(l_shipdate) < 1995
        UNION ALL
        SELECT CAST(1 AS INTEGER), COUNT(*), {sql_dsum("l_quantity", "sum_qty")}
        FROM lineitem WHERE YEAR(l_shipdate) < 1996
        UNION ALL
        SELECT CAST(2 AS INTEGER), COUNT(*), {sql_dsum("l_quantity", "sum_qty")}
        FROM lineitem
    """,
)
def table_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage layer: three commits (overwrite, two appends) then a read of
    EVERY snapshot — v0/v1/v2 counts+sums must equal the cumulative-filter
    oracles, proving old manifests stay readable after later commits (the
    ``output_crs`` re-load analog is a reprocessing job reading the epoch
    it was launched against, not whatever landed since)."""
    lf = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_shipdate")
    y = F.year("l_shipdate")
    t = _fresh_table("tt")
    t.write(lf.where(y < 1995), mode="overwrite", n_files=4)
    t.write(lf.where(y == 1995), n_files=4)
    t.write(lf.where(y >= 1996), n_files=4)
    snaps = [
        t.read(spark, v)
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity", "sum_qty"))
        .select(F.lit(v).cast("int").alias("version"), "n_rows", "sum_qty")
        for v in t.versions()
    ]
    return reduce(lambda a, b: a.unionByName(b), snaps)


@register(
    "table_compaction",
    oracle=f"""
        SELECT CAST(0 AS INTEGER) AS version, CAST(8 AS INTEGER) AS n_files,
               COUNT(*) AS n_rows, {sql_dsum("value", "sum_value")}
        FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT CAST(1 AS INTEGER), CAST(16 AS INTEGER),
               COUNT(*), {sql_dsum("value", "sum_value")}
        FROM events
        UNION ALL
        SELECT CAST(2 AS INTEGER), CAST(2 AS INTEGER),
               COUNT(*), {sql_dsum("value", "sum_value")}
        FROM events
    """,
)
def table_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage layer: two 8-file appends then ``compact(2)`` — content
    (counts+sums) is invariant across the rewrite while the file count
    drops 16 → 2.  File counts are storage facts fixed by construction
    (coalesce), so the oracle pins them as literals; row content comes
    from the distributed read-back of each snapshot."""
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    t = _fresh_table("cmp")
    t.write(ev.where(F.col("event_id") % 2 == 0), mode="overwrite", n_files=8)
    t.write(ev.where(F.col("event_id") % 2 == 1), n_files=8)
    t.compact(spark, n_files=2)
    snaps = [
        t.read(spark, v)
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("value", "sum_value"))
        .select(
            F.lit(v).cast("int").alias("version"),
            F.lit(t.file_count(v)).cast("int").alias("n_files"),
            "n_rows",
            "sum_value",
        )
        for v in t.versions()
    ]
    return reduce(lambda a, b: a.unionByName(b), snaps)


@register(
    "table_merge_upsert",
    oracle=f"""
        SELECT CAST(0 AS INTEGER) AS version, COUNT(*) AS n_rows,
               {sql_dsum("value", "sum_value")}
        FROM events
        UNION ALL
        SELECT CAST(1 AS INTEGER), COUNT(*), {sql_dsum("value", "sum_value")}
        FROM (
            SELECT CASE WHEN event_id < 1000 AND event_id % 2 = 0
                        THEN value + 1000 ELSE value END AS value
            FROM events
            UNION ALL
            SELECT value * 2 AS value FROM events WHERE event_id < 100
        )
    """,
)
def table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage layer: MERGE (upsert) with file-level copy-on-write — the
    Delta ``MERGE INTO`` / "reprocessed scene replaces indexed dataset"
    analog.  v0 is the full events table range-clustered on the merge key
    across 8 files; the merge updates the low-key stripe (+1000) and
    inserts fresh high keys — so only the file(s) covering the low range
    are rewritten and every untouched file rides into v1 verbatim
    (partial-rewrite invariant pinned in tests/test_versioned.py).  Both
    snapshots stay readable; content equals the CASE-expression oracle."""
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    t = _fresh_table("mrg")
    t.write(ev.repartitionByRange(8, "event_id"), mode="overwrite")
    upd = ev.where((F.col("event_id") < 1000) & (F.col("event_id") % 2 == 0)).select(
        "event_id", (F.col("value") + 1000).alias("value")
    )
    ins = ev.where(F.col("event_id") < 100).select(
        (F.col("event_id") + 1_000_000).alias("event_id"),
        (F.col("value") * 2).alias("value"),
    )
    t.merge(spark, upd.unionByName(ins), key="event_id")
    snaps = [
        t.read(spark, v)
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("value", "sum_value"))
        .select(F.lit(v).cast("int").alias("version"), "n_rows", "sum_value")
        for v in t.versions()
    ]
    return reduce(lambda a, b: a.unionByName(b), snaps)
