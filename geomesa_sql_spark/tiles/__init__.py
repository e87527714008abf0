from geomesa_sql_spark.tiles.assign import assign_tiles, tile_stats  # noqa: F401
