from geomesa_sql_spark.streaming.windowed import (  # noqa: F401
    drain_merge_into,
    drain_upsert,
    run_available_now,
    stateful_running_totals,
    stream_spatial_join,
    stream_stream_dwithin_join,
    streaming_exact_dedup,
    stream_events,
    windowed_counts,
)
from geomesa_sql_spark.streaming.dedup import (  # noqa: F401
    banded_signatures,
    streaming_lsh_near_dup,
)
from geomesa_sql_spark.streaming.cluster import (  # noqa: F401
    DbscanMaintainer,
    streaming_dbscan,
)
