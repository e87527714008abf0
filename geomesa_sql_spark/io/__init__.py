from geomesa_sql_spark.io.layout import add_cell, write_geo_table  # noqa: F401
from geomesa_sql_spark.io.images import (  # noqa: F401
    decode_image,
    encode_png,
    encode_raw,
    psnr,
)
from geomesa_sql_spark.io.fixtures import (  # noqa: F401
    images_table,
    nation_squares,
    nation_squares_sql,
    orders_points,
    orders_points_sql,
    supplier_points,
    supplier_points_sql,
)
from geomesa_sql_spark.io.geoparquet import (  # noqa: F401
    geoparquet_meta,
    read_geoparquet,
    write_geoparquet,
)
from geomesa_sql_spark.io.geojson import (  # noqa: F401
    read_geojsonl,
    write_geojsonl,
)
