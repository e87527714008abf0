"""Geo table layout: the ingest-time analog of GeoMesa's Z-index.

The reference relies on GeoMesa writing features into Z2/XZ2-indexed
key space so pushed-down spatial filters become index range scans. Our
analog (SURVEY.md §7.1 step 3): every geo table gets a ``cell`` int64
Z-order column at a fixed ``data_res``; files are range-partitioned and
sorted by ``cell``, so
- parquet footer min/max stats on ``cell`` make the cell-range
  predicates from ``plan.filter`` prune row groups and whole files,
- a join repartitioned by coarse cell reads mostly-local data.

At Iceberg scale the same layout is ``PARTITIONED BY (bucket/truncate
(cell))`` + sorted writes; the DataFrame code is identical (TableIO
seam per SURVEY.md §1 — parquet locally, Iceberg when the runtime jar
is present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_sql_spark.cells.column import zorder_cell_col

DEFAULT_DATA_RES = 12


def add_cell(
    df: DataFrame, x: str = "lon", y: str = "lat", res: int = DEFAULT_DATA_RES,
    col: str = "cell",
) -> DataFrame:
    """Add the Z-order ``cell`` column from lon/lat columns (JVM-side,
    whole-stage codegen — cells/column.py)."""
    return df.withColumn(col, zorder_cell_col(F.col(x), F.col(y), res))


def write_geo_table(
    df: DataFrame,
    path: str,
    x: str = "lon",
    y: str = "lat",
    res: int = DEFAULT_DATA_RES,
    partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a parquet geo table clustered by Z-order cell.

    ``repartitionByRange(cell)`` gives each output file a tight cell
    range (→ file-level pruning); ``sortWithinPartitions`` gives tight
    row-group stats within files (→ row-group pruning).
    """
    out = df if "cell" in df.columns else add_cell(df, x, y, res)
    n = partitions or out.sparkSession.sparkContext.defaultParallelism
    (
        out.repartitionByRange(n, F.col("cell"))
        .sortWithinPartitions("cell")
        .write.mode(mode)
        .parquet(path)
    )
