from geomesa_sql_spark.tiles.assign import assign_tiles, pyramid_rollup, tile_stats  # noqa: F401
