from geomesa_sql_spark.geom.model import Geom  # noqa: F401
from geomesa_sql_spark.geom.wkt import geom_from_wkt, geom_to_wkt  # noqa: F401
from geomesa_sql_spark.geom.wkb import geom_from_wkb, geom_to_wkb  # noqa: F401
from geomesa_sql_spark.geom.kernel import (  # noqa: F401
    envelope,
    points_in_polygon,
    points_intersect_geom,
    points_to_geom_dist,
    relate,
    relate_many,
)
