from geomesa_sql_spark.tiles.assign import (  # noqa: F401
    assign_s2_cells,
    assign_tiles,
    build_pyramid,
    invert_tiles,
    merge_pyramids,
    pyramid_rollup,
    s2_range_predicate,
    tile_envelope,
    tile_mosaic,
    tile_stats,
)
