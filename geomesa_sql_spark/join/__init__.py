from geomesa_sql_spark.join.spatial import spatial_join  # noqa: F401
from geomesa_sql_spark.join.knn import (  # noqa: F401
    knn_join,
    knn_join_adaptive,
    knn_join_cells,
)
from geomesa_sql_spark.join.lookup import index_lookup_join  # noqa: F401
from geomesa_sql_spark.join.bloom import bloom_prefilter_join  # noqa: F401
