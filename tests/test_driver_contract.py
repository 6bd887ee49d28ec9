"""Driver-contract lint: every registered key must produce output the
driver's canonicalizer can hash.

The canonicalizer converts the result to pandas and sorts/hashes every
cell; array/map/struct columns arrive as ndarray/dict cells and raise
``TypeError: unhashable type`` — a hard red row regardless of the math
(this killed ``agg_approx_percentile`` in round 1).  Schema inspection is
lazy (no job runs), so this covers all keys cheaply.
"""

from __future__ import annotations

from pyspark.sql import types as T

from odc_product_docker_images_spark import registry

from conftest import SF_DIR

_UNHASHABLE = (T.ArrayType, T.MapType, T.StructType)


def test_all_keys_emit_hashable_scalar_schemas(spark):
    offenders = {}
    for key, q in registry.all_queries().items():
        df = q.fn(spark, SF_DIR)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, _UNHASHABLE)
        ]
        if bad:
            offenders[key] = bad
    assert not offenders, f"non-scalar output columns break the driver gate: {offenders}"


def test_oracle_keys_subset_of_queries(spark):
    qs = registry.queries()
    os_ = registry.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(isinstance(v, str) and v.strip() for v in os_.values())
