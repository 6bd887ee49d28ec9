"""Custom Python Data Source (SURVEY.md §2.1 S2) — the ``Datacube.load``
scan re-expressed as a PySpark 4 DataSource.

Reference analog: ``datacube-core``'s load path — the Postgres extent index
enumerates datasets, each (tile × time) becomes an independent read task,
GDAL materializes pixels.  Here the same shape: the source plans one
``InputPartition`` per tile, each partition materializes its pixel rows
independently on an executor — embarrassingly parallel, no driver
bottleneck, exactly how a raster-ingest bridge would be wired when real
GDAL bindings exist.

The pixel values are a deterministic function of (tile, y, x, band) so
tests can assert exact content; a real deployment swaps `_tile_pixels`
for rasterio reads.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class TilePartition(InputPartition):
    def __init__(self, tile_x: int, tile_y: int):
        self.tile_x = tile_x
        self.tile_y = tile_y


class SyntheticTileReader(DataSourceReader):
    def __init__(self, options: dict):
        self.tiles = int(options.get("tiles", "4"))
        self.tile_size = int(options.get("tile_size", "32"))

    def partitions(self) -> list[InputPartition]:
        # one read task per tile — the master's tile×time job fan-out
        return [TilePartition(tx, ty) for tx in range(self.tiles) for ty in range(self.tiles)]

    def read(self, partition: TilePartition) -> Iterator[tuple]:
        n = self.tile_size
        base_y = partition.tile_y * n
        base_x = partition.tile_x * n
        for yy in range(n):
            for xx in range(n):
                y, x = base_y + yy, base_x + xx
                # deterministic 'bands' (stand-in for GDAL pixel reads)
                red = float((y * 31 + x * 17) % 255)
                nir = float((y * 13 + x * 41) % 255)
                yield (partition.tile_x, partition.tile_y, y, x, red, nir)


class SyntheticTileSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_tiles"

    def schema(self) -> str:
        return "tile_x int, tile_y int, y long, x long, red double, nir double"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticTileReader(self.options)


def register_tile_source(spark) -> None:
    spark.dataSource.register(SyntheticTileSource)
