"""Structured Streaming operators — engine extension.

The reference is strictly batch (SURVEY.md §2.8: request/response pull,
no watermarks/windows/state), so nothing here claims parity; these are
the streaming shapes a production deployment of this engine needs, on
Spark's own machinery:

- ``windowed_counts``: watermark + tumbling/sliding event-time window
  aggregation (late data beyond the watermark is dropped by Spark).
- ``stateful_running_totals``: custom per-key state via
  ``applyInPandasWithState`` — the template for stateful operators the
  built-ins can't express (running aggregates with custom eviction).
- ``run_available_now``: drain a source with the available-now trigger
  into a memory sink — batch-equivalent execution of the same plan,
  which is also how the tests oracle streaming results against plain
  ``groupBy`` on the same data.

At scale the source is a file/Kafka stream; here the parquet directory
source stands in (same DataFrame code — the TableIO seam again).
"""

from __future__ import annotations

import uuid
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_events(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Open a parquet directory as a stream (one file = one microbatch
    unit; schema required by Structured Streaming file sources)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked event-time window aggregation.

    Output: window struct + keys + n + sum_value. Rows later than
    ``watermark`` behind the max seen event time are dropped — the
    standard late-data contract.
    """
    win = F.window(F.col(ts_col), window, slide or window)
    # watermarks require TIMESTAMP (LTZ); parquet NTZ casts exactly under
    # the engine's pinned UTC session timezone (SURVEY.md §1.2)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
    )


_RUN_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("total_n", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("v", T.DoubleType())]
)


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Per-key running totals with explicit state — the
    ``applyInPandasWithState`` template (custom stateful operator)."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"event_type": [key[0]], "total_n": [n], "total_value": [v]}
        )

    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update, _RUN_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )


def run_available_now(
    stream_df: DataFrame, mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Drain the stream with the available-now trigger into a memory
    sink; returns the sink table. ``mode``: 'complete' for windowed
    aggregations, 'update' for applyInPandasWithState queries."""
    name = name or f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def stream_spatial_join(
    stream_points: DataFrame,
    static_polys: DataFrame,
    x: str,
    y: str,
    wkb: str,
    predicate: str = "intersects",
    res: int = 6,
    distance: float | None = None,
) -> DataFrame:
    """Stream-static spatial join: a stream of points against a static
    polygon set.

    Stateless on the stream side — JVM cell encode per micro-batch,
    broadcast hash join against the static side's exploded cell cover,
    vectorized refine — so it runs in append mode with no state store.
    (A stream-stream spatial join would need watermarked symmetric
    state; the geo-enrichment shape — events × zones — is stream-static
    in practice.)
    """
    from geomesa_sql_spark.join import spatial_join
    from geomesa_sql_spark.join.spatial import point_side, wkb_side

    return spatial_join(
        stream_points,
        static_polys,
        point_side(x, y),
        wkb_side(wkb),
        predicate=predicate,
        distance=distance,
        res=res,           # required: no sampling jobs on a stream
        broadcast=True,    # required: no count() probe on a stream
    )
