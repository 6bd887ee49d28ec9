"""io.table_rows — footer-metadata row counts for sizing/audit gates (r13).

The r13 optimization replaced raw-table sizing ``count()`` jobs (geomedian
partition sizing, similarity grid sizing, audit-gate thresholds) with
parquet-footer row counts.  Value identity is the whole contract: the
footer count must equal ``load(...).count()`` for every fixture table, or
partition counts / audit slices silently change.
"""

from __future__ import annotations

from conftest import SF_DIR

from odc_product_docker_images_spark.io import load, table_rows


def test_table_rows_matches_spark_count(spark):
    for table in ("lineitem", "events", "documents", "embeddings"):
        assert table_rows(SF_DIR, table) == load(spark, SF_DIR, table).count(), table


def test_table_rows_handles_directory_tables(spark, tmp_path):
    """Replica fixtures are DIRECTORIES of part files — the footer count
    must sum every part."""
    out = tmp_path / "t.parquet"
    spark.range(1234).write.mode("overwrite").parquet(str(out))
    assert table_rows(str(tmp_path), "t") == 1234
