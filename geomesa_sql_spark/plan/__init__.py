from geomesa_sql_spark.plan.filter import cell_prune_ranges, spatial_filter  # noqa: F401
from geomesa_sql_spark.plan.scan import GeoTable, ScanSpec  # noqa: F401
