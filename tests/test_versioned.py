"""Versioned-manifest table format: snapshot isolation, time travel,
compaction invariants (sources/versioned.py)."""

from __future__ import annotations

import json
import uuid
from pathlib import Path

from pyspark.sql import functions as F

from odc_product_docker_images_spark.sources.versioned import VersionedTable


def _table() -> VersionedTable:
    base = Path(__file__).resolve().parent.parent / ".tmp" / f"vtest_{uuid.uuid4().hex[:8]}"
    return VersionedTable(str(base))


def test_commit_log_and_time_travel(spark):
    t = _table()
    df = spark.range(100).withColumnRenamed("id", "k")
    assert t.versions() == []
    v0 = t.write(df.where("k < 40"), mode="overwrite", n_files=2)
    v1 = t.write(df.where("k >= 40"), n_files=2)
    assert (v0, v1) == (0, 1)
    assert t.read(spark, 0).count() == 40
    assert t.read(spark, 1).count() == 100
    assert t.read(spark).count() == 100  # latest by default
    # overwrite drops history from the NEW snapshot but not from old ones
    t.write(df.where("k < 10"), mode="overwrite", n_files=1)
    assert t.read(spark, 2).count() == 10
    assert t.read(spark, 1).count() == 100


def test_compaction_preserves_content_and_history(spark):
    t = _table()
    df = spark.range(1000).withColumnRenamed("id", "k")
    t.write(df.where("k % 2 = 0"), mode="overwrite", n_files=4)
    t.write(df.where("k % 2 = 1"), n_files=4)
    assert t.file_count(1) == 8
    t.compact(spark, n_files=2)
    assert t.file_count(2) == 2
    # content invariant across the rewrite
    assert t.read(spark, 2).count() == 1000
    assert sorted(r.k for r in t.read(spark, 2).collect()) == list(range(1000))
    # pre-compaction snapshot still plans its original files
    assert t.file_count(1) == 8
    assert t.read(spark, 1).count() == 1000


def test_manifest_is_plan_source_not_directory_listing(spark):
    t = _table()
    df = spark.range(50).withColumnRenamed("id", "k")
    t.write(df, mode="overwrite", n_files=1)
    # drop a stray parquet file into data/ — a manifest-driven reader
    # must NOT pick it up (directory listing would)
    stray_dir = t.data_dir / "stray"
    df.limit(7).write.mode("overwrite").parquet(str(stray_dir))
    assert t.read(spark, 0).count() == 50
    m = json.loads((t.manifest_dir / "v0.json").read_text())
    assert m["operation"] == "overwrite"
    assert all("stray" not in f for f in m["files"])


def test_merge_is_file_level_copy_on_write(spark):
    """MERGE must rewrite ONLY files containing matched keys; untouched
    files ride into the new manifest verbatim, and both snapshots read
    correct content."""
    t = _table()
    df = spark.range(1000).withColumnRenamed("id", "k").withColumn("v", F.col("k") * 10)
    t.write(df.repartitionByRange(8, "k"), mode="overwrite")
    v0_files = set(t.snapshot_files(0))
    assert len(v0_files) == 8
    # updates hit only the lowest range stripe; inserts get fresh keys
    upd = spark.range(50).select(F.col("id").alias("k"), F.lit(-1).alias("v"))
    ins = spark.range(5).select((F.col("id") + 10_000).alias("k"), F.lit(7).alias("v"))
    t.merge(spark, upd.unionByName(ins), key="k")
    v1_files = set(t.snapshot_files(1))
    kept = v0_files & v1_files
    rewritten = v0_files - v1_files
    assert len(rewritten) <= 2, f"merge rewrote {len(rewritten)} of 8 files"
    assert len(kept) >= 6, "untouched files must carry into the new manifest"
    # content: updated rows replaced, inserts present, rest untouched
    v1 = {r.k: r.v for r in t.read(spark, 1).collect()}
    assert len(v1) == 1005
    assert all(v1[k] == -1 for k in range(50))
    assert all(v1[k] == k * 10 for k in range(50, 1000))
    assert all(v1[k + 10_000] == 7 for k in range(5))
    # old snapshot unharmed
    assert t.read(spark, 0).count() == 1000
