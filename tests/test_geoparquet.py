"""GeoParquet interop: standard 'geo' footer on write, metadata-driven
read, footer-bbox file pruning (io/geoparquet.py)."""

import json

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from geomesa_sql_spark.geom import model
from geomesa_sql_spark.geom.wkb import geom_from_wkb, geom_to_wkb
from geomesa_sql_spark.io.geoparquet import (
    _data_files as _data_files_list,
    geoparquet_meta,
    read_geoparquet,
    write_geoparquet,
)


def _square_df(spark, n=40, with_null=False):
    """n unit squares marching east: row i covers [i, i+1]x[0, 1]."""
    rows = []
    for i in range(n):
        wkb = bytearray(geom_to_wkb(model.box(float(i), 0.0, i + 1.0, 1.0)))
        rows.append((i, bytes(wkb)))
    if with_null:
        rows.append((n, None))
    return spark.createDataFrame(rows, "id int, geom binary")


def test_write_marks_every_file(spark, tmp_path):
    path = str(tmp_path / "gp")
    write_geoparquet(_square_df(spark).repartition(4), path, geometry="geom")
    files = [str(p) for p in (tmp_path / "gp").glob("*.parquet")]
    assert len(files) >= 2
    for f in files:
        md = pq.ParquetFile(f).schema_arrow.metadata
        geo = json.loads(md[b"geo"])
        assert geo["version"] == "1.1.0"  # covering column present (r4)
        assert geo["primary_column"] == "geom"
        col = geo["columns"]["geom"]
        assert col["encoding"] == "WKB"
        assert col["geometry_types"] == ["Polygon"]
        # file bbox must cover exactly that file's own rows
        ids = pq.read_table(f).column("id").to_pylist()
        lo, hi = min(ids), max(ids) + 1
        bx = col["bbox"]
        assert bx[0] >= 0 and bx[2] <= 40
        assert bx[0] <= lo + 1 and bx[2] >= hi - 1
        assert bx[1] == 0.0 and bx[3] == 1.0


def test_round_trip_and_meta(spark, tmp_path):
    path = str(tmp_path / "gp")
    write_geoparquet(_square_df(spark, with_null=True), path)
    df, meta = read_geoparquet(spark, path)
    assert meta["primary_column"] == "geom"
    got = {r.id: r.geom for r in df.collect()}
    assert len(got) == 41 and got[40] is None
    g = geom_from_wkb(bytes(got[7]))
    assert g.type == "Polygon" and g.envelope() == (7.0, 0.0, 8.0, 1.0)


def test_bbox_prunes_files(spark, tmp_path):
    path = str(tmp_path / "gp")
    # range-partition by id so each file holds a distinct east-west band
    write_geoparquet(
        _square_df(spark).repartitionByRange(4, F.col("id")), path
    )
    full, _ = read_geoparquet(spark, path)
    pruned, _ = read_geoparquet(spark, path, bbox=(0.0, 0.0, 3.5, 1.0))
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # pruning drops whole files only — every square intersecting the
    # bbox must survive (ids 0..3 inclusive)
    ids = {r.id for r in pruned.collect()}
    assert ids >= {0, 1, 2, 3}
    # disjoint bbox → empty frame, schema preserved
    empty, _ = read_geoparquet(spark, path, bbox=(500.0, 50.0, 600.0, 60.0))
    assert empty.count() == 0 and empty.columns == ["id", "geom", "bbox"]


def test_null_only_file_and_mixed_types(spark, tmp_path):
    pt = geom_to_wkb(model.point(5.0, 5.0))
    df = spark.createDataFrame(
        [(0, None), (1, bytes(pt))], "id int, geom binary"
    ).coalesce(1)
    path = str(tmp_path / "gp2")
    write_geoparquet(df, path)
    meta = geoparquet_meta(path)
    col = meta["columns"]["geom"]
    assert col["geometry_types"] == ["Point"]
    assert col["bbox"] == [5.0, 5.0, 5.0, 5.0]


def test_hive_partitioned_layout(spark, tmp_path):
    df = _square_df(spark).withColumn("band", F.col("id") % 2)
    path = str(tmp_path / "gp_hive")
    df.write.partitionBy("band").parquet(path)
    # attach footers over the already-written hive layout
    from geomesa_sql_spark.io.geoparquet import _attach_geo_footer, _data_files

    files = _data_files(path)
    assert all("band=" in f for f in files)
    for f in files:
        _attach_geo_footer(f, "geom")
    out, meta = read_geoparquet(spark, path, bbox=(0.0, 0.0, 100.0, 1.0))
    assert meta["primary_column"] == "geom"
    # partition column survives the explicit-file-list read
    assert set(out.columns) == {"id", "geom", "band"}
    assert out.count() == 40


def test_rejects_non_binary_and_non_geo(spark, tmp_path):
    df = spark.range(3).withColumn("geom", F.col("id").cast("string"))
    with pytest.raises(ValueError, match="BinaryType"):
        write_geoparquet(df, str(tmp_path / "bad"))
    plain = str(tmp_path / "plain")
    spark.range(3).write.parquet(plain)
    with pytest.raises(ValueError, match="not GeoParquet"):
        geoparquet_meta(plain)


def test_attach_is_idempotent_and_keeps_codec(spark, tmp_path):
    """Already-attached files are skipped byte-identically (appends stay
    O(new files)); the original compression codec survives the rewrite
    (review r3c)."""
    import pyarrow as pa

    from geomesa_sql_spark.geom.wkb import geom_to_wkb
    from geomesa_sql_spark.geom import model as gm
    from geomesa_sql_spark.io.geoparquet import _attach_geo_footer

    f = str(tmp_path / "z.parquet")
    tbl = pa.table({"id": [1, 2], "geom": [
        geom_to_wkb(gm.point(1.0, 2.0)), geom_to_wkb(gm.point(3.0, 4.0))]})
    pq.write_table(tbl, f, compression="gzip")
    _attach_geo_footer(f, "geom")
    assert pq.ParquetFile(f).metadata.row_group(0).column(0).compression == "GZIP"
    before = open(f, "rb").read()
    r = _attach_geo_footer(f, "geom")  # second call: skip, same meta
    assert open(f, "rb").read() == before
    assert r[1] == [1.0, 2.0, 3.0, 4.0] and r[2] == ["Point"]


def test_bbox_never_prunes_antimeridian_files(spark, tmp_path):
    """A spec-legal wrap-around bbox (minx > maxx) in a foreign file is
    never pruned (review r3c)."""
    import pyarrow as pa

    from geomesa_sql_spark.geom import model as gm
    from geomesa_sql_spark.geom.wkb import geom_to_wkb

    f = tmp_path / "gpw"
    f.mkdir()
    fp = str(f / "fiji.parquet")
    tbl = pa.table({"id": [1], "geom": [geom_to_wkb(gm.point(179.0, -15.0))]})
    pq.write_table(tbl, fp)
    # hand-author a wrap-around footer bbox like a foreign writer would
    geo = {"version": "1.0.0", "primary_column": "geom",
           "columns": {"geom": {"encoding": "WKB", "geometry_types": ["Point"],
                                 "bbox": [170.0, -20.0, -170.0, -10.0]}}}
    t = pq.read_table(fp)
    md = dict(t.schema.metadata or {})
    md[b"geo"] = json.dumps(geo).encode()
    pq.write_table(t.replace_schema_metadata(md), fp)
    got, _ = read_geoparquet(spark, str(f), bbox=(175.0, -20.0, 180.0, -10.0))
    assert got.count() == 1


def test_clustered_write_tightens_file_bboxes(spark, tmp_path):
    """cluster=True range-partitions by envelope-centroid Z-cell: file
    bboxes become tight bands instead of world-spanning, so footer-bbox
    pruning actually prunes; row content is unchanged."""
    # spatially shuffled input: every unclustered file spans the world
    df = _square_df(spark, n=64).withColumn(
        "shuf", F.xxhash64("id")
    ).repartitionByRange(4, "shuf").drop("shuf")
    plain, clus = str(tmp_path / "plain"), str(tmp_path / "clus")
    write_geoparquet(df, plain)
    write_geoparquet(df, clus, cluster=True, partitions=4)

    def widths(path):
        metas = [
            json.loads((pq.ParquetFile(f).schema_arrow.metadata)[b"geo"])
            for f in sorted(str(p) for p in __import__("pathlib").Path(path).glob("*.parquet"))
        ]
        return [
            m["columns"]["geom"]["bbox"][2] - m["columns"]["geom"]["bbox"][0]
            for m in metas
            if "bbox" in m["columns"]["geom"]
        ]
    assert max(widths(clus)) < max(widths(plain)) / 2
    got_all, _ = read_geoparquet(spark, clus)
    assert {r.id for r in got_all.collect()} == set(range(64))
    pruned, _ = read_geoparquet(spark, clus, bbox=(0.0, 0.0, 8.0, 1.0))
    full, _ = read_geoparquet(spark, clus)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert {r.id for r in pruned.collect()} >= set(range(8))


def test_covering_prunes_row_groups(spark, tmp_path):
    """VERDICT r3 #4: GeoParquet 1.1 covering column → row-group-level
    bbox pruning inside a file, mirroring bench.py's
    _row_group_prune_stats for the engine's own cell layout. One file,
    many small row groups over a clustered west-to-east layout: parquet
    min/max stats on bbox.xmin/xmax must exclude most groups for a
    narrow query bbox, and the Spark read must push the covering filter
    into the scan."""
    path = str(tmp_path / "gp_rg")
    # 4000 squares marching east, sorted, one file, ~tiny row groups
    df = _square_df(spark, n=4000).sort("id").coalesce(1)
    # runtime spark.conf.set("spark.hadoop.*") doesn't reach the writer;
    # set the live Hadoop conf (and restore) to force small row groups
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev_block = hconf.get("parquet.block.size")
    prev_page = hconf.get("parquet.page.size")
    hconf.set("parquet.block.size", str(16 * 1024))
    hconf.set("parquet.page.size", str(4 * 1024))
    try:
        write_geoparquet(df, path, geometry="geom")
    finally:
        if prev_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev_block)
        if prev_page is None:
            hconf.unset("parquet.page.size")
        else:
            hconf.set("parquet.page.size", prev_page)

    files = _data_files_list(path)
    assert len(files) == 1
    pf = pq.ParquetFile(files[0])
    md = pf.metadata
    assert md.num_row_groups >= 4, "need multiple row groups to prune"
    # footer declares the covering paths
    geo = json.loads(pf.schema_arrow.metadata[b"geo"])
    cov = geo["columns"]["geom"]["covering"]["bbox"]
    assert cov["xmin"] == ["bbox", "xmin"] and cov["ymax"] == ["bbox", "ymax"]

    # stats-level prune count: same math the parquet reader applies
    qx0, qx1 = 100.25, 140.75
    sch = md.schema.to_arrow_schema()
    names = [md.schema.column(i).path for i in range(md.num_columns)]
    ix_min = names.index("bbox.xmin")
    ix_max = names.index("bbox.xmax")
    total = read = 0
    for rg in range(md.num_row_groups):
        st_min = md.row_group(rg).column(ix_min).statistics
        st_max = md.row_group(rg).column(ix_max).statistics
        total += 1
        if st_min.min <= qx1 and st_max.max >= qx0:
            read += 1
    assert read < total, f"no row-group pruning possible ({read}/{total})"

    # the Spark read pushes the covering comparison into the scan
    out, _ = read_geoparquet(spark, path, bbox=(qx0, 0.0, qx1, 1.0))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "bbox.xmin" in plan, plan
    ids = sorted(r.id for r in out.collect())
    assert ids == list(range(100, 141))  # squares [i,i+1] overlapping bbox
