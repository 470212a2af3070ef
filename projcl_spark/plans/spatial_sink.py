"""Z-order-clustered parquet sink — spatial layout for O(range) reads.

The reference's only persistence is raw host buffers
(``pl_load_buffer``/``pl_unload_buffer``, src/projcl_run.c); it has no
layout story at all.  At 100 TB the LAYOUT is the query plan: writing
points clustered by Morton key turns every quadrant/tile read into one
contiguous key range, so parquet min-max statistics prune files and row
groups instead of scanning the corpus.

``write_spatial`` = morton key → ``repartitionByRange`` (range-partitioned
shuffle: each output file owns a disjoint key interval) →
``sortWithinPartitions`` (row groups inside a file are internally ordered)
→ parquet.  ``read_spatial_cell`` maps a quadtree cell at any coarser
resolution to its half-open morton interval (``morton_range_np`` — the
Z-order prefix property) and issues a range filter that Spark pushes into
the scan (`PushedFilters: [GreaterThanOrEqual(_morton,..),
LessThan(_morton,..)]`), touching only the files whose stats overlap.

Scale notes: repartitionByRange samples the key distribution, so skewed
data still yields balanced files; ``buckets`` should target ~128 MB files
at production scale.  The morton key is carried as a column (`_morton`)
— readers that don't know the scheme see ordinary parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.cells import morton_col, morton_range_np

MORTON_COL = "_morton"


def write_spatial(
    df: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    res: int = 12,
    buckets: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to ``path`` clustered by the res-``res`` Morton key."""
    keyed = df.withColumn(MORTON_COL, morton_col(F.col(lon), F.col(lat), res))
    n = buckets or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, MORTON_COL)
        .sortWithinPartitions(MORTON_COL)
        .write.mode(mode)
        .parquet(path)
    )


def read_spatial_cell(
    spark: SparkSession,
    path: str,
    cell_id: int,
    cell_res: int,
    res: int = 12,
) -> DataFrame:
    """All rows of a spatial sink inside one cell at ``cell_res`` — a
    single pushed-down range predicate on the sink's morton column."""
    lo, hi = morton_range_np(cell_id, cell_res, res)
    return spark.read.parquet(path).filter(
        (F.col(MORTON_COL) >= F.lit(lo)) & (F.col(MORTON_COL) < F.lit(hi))
    )
