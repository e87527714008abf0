from geomesa_sql_spark.functions.st import (  # noqa: F401
    register_all,
    st_cell,
    st_distance_point_cols,
    st_point_wkb,
    st_predicate_point_cols,
    st_predicate_wkb,
)
