from geomesa_sql_spark.cells.curve import (  # noqa: F401
    MAX_RES,
    cell_envelope,
    cover_envelope,
    cover_envelopes,
    hilbert_d2xy,
    hilbert_xy2d,
    lonlat_to_cell,
    lonlat_to_xy,
    morton_encode,
    xy_to_lonlat,
)
from geomesa_sql_spark.cells import s2  # noqa: F401
