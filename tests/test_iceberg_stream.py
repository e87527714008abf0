"""Iceberg Python Data Source (io/iceberg_stream.py): native batch
reads with manifest-level filter pushdown, incremental append-scan
streaming, and the metadata inspection tables."""

import shutil

import pytest
from pyspark.sql.datasource import GreaterThan, In

from geomesa_sql_spark.io import iceberg_meta as im
from geomesa_sql_spark.io.iceberg_stream import (
    IcebergBatchReader,
    files_df,
    history_df,
    manifests_df,
    register_iceberg_source,
    snapshots_df,
)


def _mk(spark, a, b):
    return spark.range(a, b).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS v", "CAST(id AS STRING) AS s"
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "ice")
    shutil.rmtree(path, ignore_errors=True)
    im.create_table(_mk(spark, 0, 100), path)
    im.append(_mk(spark, 100, 180), path)
    register_iceberg_source(spark)
    return path


def test_batch_read_matches_table(spark, table):
    df = spark.read.format("geomesa_iceberg").load(table)
    assert df.count() == 180
    assert set(df.columns) == {"id", "v", "s"}
    want = im.IcebergTable.load(table).read(spark).toPandas()
    got = df.toPandas()
    assert sorted(got["id"]) == sorted(want["id"])


def test_filter_pushdown_prunes_files(spark, table):
    r = IcebergBatchReader(table, {})
    n_all = len(r.partitions())
    list(r.pushFilters([GreaterThan(("id",), 150)]))
    assert len(r.partitions()) < n_all
    # IN-list pruning
    r2 = IcebergBatchReader(table, {})
    list(r2.pushFilters([In(("id",), (3, 5))]))
    assert len(r2.partitions()) < n_all
    # and the pruned plan still returns exact results (residual
    # re-evaluation by Spark — pruning is conservative)
    got = spark.read.format("geomesa_iceberg").load(table).filter("id > 150")
    assert got.count() == 29
    assert got.selectExpr("min(id)").collect()[0][0] == 151


def test_batch_read_respects_snapshot_option(spark, table):
    sid = snapshots_df(spark, table).orderBy("sequence_number").collect()[0]
    df = (
        spark.read.format("geomesa_iceberg")
        .option("snapshot_id", int(sid.snapshot_id))
        .load(table)
    )
    assert df.count() == 100


def test_mor_deletes_raise_in_batch_source(spark, table):
    t = im.IcebergTable.load(table)
    data, _, _ = t.plan_files()
    im.add_position_deletes(
        spark,
        table,
        spark.createDataFrame(
            [(data[0]["path"], 0)], "file_path string, pos long"
        ),
    )
    with pytest.raises(Exception, match="merge-on-read|MoR|compact"):
        spark.read.format("geomesa_iceberg").load(table).count()


def test_metadata_tables(spark, table):
    sn = snapshots_df(spark, table).toPandas()
    assert list(sn["operation"]) == ["append", "append"]
    assert list(sn["sequence_number"]) == [1, 2]
    assert sn["parent_id"].iloc[1] == sn["snapshot_id"].iloc[0]
    h = history_df(spark, table)
    assert h.filter("is_current_ancestor").count() == 2
    f = files_df(spark, table).toPandas()
    assert (f["content"] == 0).all() and f["record_count"].sum() == 180
    m = manifests_df(spark, table)
    assert m.count() == 2


def test_stream_reads_all_then_increments(spark, table):
    q = (
        spark.readStream.format("geomesa_iceberg")
        .load(table)
        .writeStream.format("memory")
        .queryName("ice_all")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("select count(*) c from ice_all").collect()[0].c == 180

    im.append(_mk(spark, 180, 220), table)
    q2 = (
        spark.readStream.format("geomesa_iceberg")
        .option("starting_seq", 2)
        .load(table)
        .writeStream.format("memory")
        .queryName("ice_inc")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    inc = spark.sql("select * from ice_inc").toPandas()
    assert len(inc) == 40 and inc["id"].min() == 180


def test_stream_starting_snapshot_id(spark, table):
    first = snapshots_df(spark, table).orderBy("sequence_number").collect()[0]
    q = (
        spark.readStream.format("geomesa_iceberg")
        .option("starting_snapshot_id", int(first.snapshot_id))
        .load(table)
        .writeStream.format("memory")
        .queryName("ice_from_snap")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from ice_from_snap").toPandas()
    assert len(got) == 80 and got["id"].min() == 100


def test_stream_non_append_raises(spark, table):
    im.delete_where(spark, table, "id < 10")
    q = (
        spark.readStream.format("geomesa_iceberg")
        .option("starting_seq", 2)
        .load(table)
        .writeStream.format("memory")
        .queryName("ice_bad")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="appends only"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_stream_schema_evolution_field_ids(spark, tmp_path):
    """Files written before a rename stream into the renamed column."""
    path = str(tmp_path / "ice_evolve")
    im.create_table(_mk(spark, 0, 50), path)
    im.rename_column(path, "v", "value")
    im.append(
        spark.range(50, 80).selectExpr(
            "id", "CAST(id * 2 AS DOUBLE) AS value", "CAST(id AS STRING) AS s"
        ),
        path,
    )
    register_iceberg_source(spark)
    q = (
        spark.readStream.format("geomesa_iceberg")
        .load(path)
        .writeStream.format("memory")
        .queryName("ice_evo")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from ice_evo").toPandas()
    assert len(got) == 80 and "value" in got.columns
    assert (got["value"] == got["id"] * 2.0).all()


def test_geo_iceberg_s2_layout(spark, tmp_path):
    """S2 x Iceberg: the sphere-uniform layout — s2-clustered files
    get tight s2_cell bounds in manifests, a bbox read prunes at the
    manifest level via cover_rect_ranges and matches a plain filter."""
    from pyspark.sql import functions as F

    from geomesa_sql_spark.cells import s2 as s2m
    from geomesa_sql_spark.io.iceberg import (
        read_geo_iceberg,
        write_geo_iceberg,
    )

    path = str(tmp_path / "s2g")
    df = spark.range(20000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7919 % 36000) / 100.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729 % 17000) / 100.0 - 85.0).alias("lat"),
    )
    write_geo_iceberg(df, path, res=10, partitions=16, cell_system="s2")
    bbox = (20.0, 10.0, 40.0, 30.0)
    t = im.IcebergTable.load(path)
    assert t.metadata["properties"]["geo.cell.system"] == "s2"
    ranges = s2m.cover_rect_ranges(*bbox, max_cells=64)
    # no merged range may straddle the int64 sign wall (faces 3|4 are
    # uint64-adjacent; BETWEEN over signed ids would break)
    assert all((lo >= 0) == (hi >= 0) for lo, hi in ranges)
    _, _, stats = t.plan_files(bounds={"s2_cell": ranges})
    assert stats["files_total"] == 16 and stats["files_kept"] < 16
    got = read_geo_iceberg(spark, path, bbox=bbox).toPandas()
    want = df.filter(
        (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
        & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
    ).toPandas()
    assert sorted(got["k"]) == sorted(want["k"]) and len(got) > 0


def test_geo_iceberg_s2_small_bbox_matches_plain_filter(spark, tmp_path):
    """Advice r4 (high): a bbox far smaller than one stored S2 cell
    used to build prune ranges finer than the stored level, and the
    stored ids fell outside every range — rows silently dropped. The
    read path now caps the covering at geo.cell.res."""
    from pyspark.sql import functions as F

    from geomesa_sql_spark.io.iceberg import (
        read_geo_iceberg,
        write_geo_iceberg,
    )

    path = str(tmp_path / "s2small")
    # 5000 points packed into ~0.005 deg around (20, 10): far smaller
    # than one level-10 cell, so an uncapped covering descends past 10
    df = spark.range(5000).select(
        F.col("id").alias("k"),
        (F.lit(20.0) + (F.col("id") % 100) / 20000.0).alias("lon"),
        (F.lit(10.0) + (F.col("id") % 97) / 19000.0).alias("lat"),
    )
    write_geo_iceberg(df, path, res=10, partitions=4, cell_system="s2")
    bbox = (20.0, 10.0, 20.001, 10.001)
    got = read_geo_iceberg(spark, path, bbox=bbox).toPandas()
    want = df.filter(
        (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
        & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
    ).toPandas()
    assert len(want) > 0
    assert sorted(got["k"]) == sorted(want["k"])


# ---- review r4l regression tests ----------------------------------


def test_mixed_in_and_range_filters_do_not_prune_matches(spark, table):
    """The naive max(lo)/min(hi) fold turned `x IN (1,10) AND x >= 2`
    into the inverted range (10, 1) and pruned files containing x=10 —
    silent data loss (r4l finding)."""
    got = (
        spark.read.format("geomesa_iceberg")
        .load(table)
        .filter("id IN (1, 150) AND id >= 2")
        .toPandas()
    )
    assert sorted(got["id"]) == [150]


def test_bounds_from_filters_semantics():
    from geomesa_sql_spark.io.iceberg_stream import _bounds_from_filters
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
    )

    fields = [
        {"name": "x", "type": "long", "id": 1},
        {"name": "s", "type": "string", "id": 2},
    ]
    # IN clipped by range → surviving points only
    b, empty = _bounds_from_filters(
        [In(("x",), (1, 150)), GreaterThanOrEqual(("x",), 2)], fields
    )
    assert not empty and b == {"x": [(150, 150)]}
    # empty intersection → empty scan, never an inverted range
    b, empty = _bounds_from_filters(
        [In(("x",), (1,)), GreaterThan(("x",), 5)], fields
    )
    assert empty
    b, empty = _bounds_from_filters(
        [GreaterThan(("x",), 9), LessThan(("x",), 3)], fields
    )
    assert empty
    # string columns never push (inf sentinels / str bounds mismatch)
    b, empty = _bounds_from_filters([GreaterThan(("s",), "m")], fields)
    assert not empty and b == {}
    # range-only AND folds to the intersection
    b, empty = _bounds_from_filters(
        [GreaterThan(("x",), 3), LessThan(("x",), 9)], fields
    )
    assert b == {"x": (3, 9)} and not empty
    # ANDed equalities intersect like one-element INs (advice r4:
    # x=1 AND x=2 used to keep files containing either)
    b, empty = _bounds_from_filters(
        [EqualTo(("x",), 1), EqualTo(("x",), 2)], fields
    )
    assert empty
    b, empty = _bounds_from_filters(
        [EqualTo(("x",), 1), In(("x",), (1, 2))], fields
    )
    assert not empty and b == {"x": [(1, 1)]}


def test_string_filter_does_not_crash_batch_read(spark, table):
    got = (
        spark.read.format("geomesa_iceberg")
        .load(table)
        .filter("s > '15'")  # string column: not pushed, re-evaluated
        .count()
    )
    want = (
        im.IcebergTable.load(table).read(spark).filter("s > '15'").count()
    )
    assert got == want


def test_empty_intersection_returns_zero_rows(spark, table):
    got = (
        spark.read.format("geomesa_iceberg")
        .load(table)
        .filter("id IN (5) AND id > 50")
        .count()
    )
    assert got == 0


def test_stream_plans_only_added_manifests(spark, table):
    """The incremental scan must plan from the added-manifest
    provenance, not a full two-snapshot path diff (r4l finding)."""
    from geomesa_sql_spark.io.iceberg_stream import _added_files

    t = im.IcebergTable.load(table)
    snaps = sorted(t.snapshots(), key=lambda s: s["sequence-number"])
    first, second = snaps
    a1 = _added_files(t, first)
    a2 = _added_files(t, second)
    assert a1 is not None and a2 is not None
    assert len(a1) > 0 and len(a2) > 0
    assert not (set(a1) & set(a2))
    # provenance plan == path-diff plan
    from geomesa_sql_spark.io.iceberg_stream import _files_at

    diff = _files_at(t, second["snapshot-id"]) - _files_at(
        t, first["snapshot-id"]
    )
    assert set(a2) == diff


def test_manifests_df_zero_counts_stay_zero(spark, table):
    from geomesa_sql_spark.io.iceberg_stream import manifests_df

    m = manifests_df(spark, table).toPandas()
    # the carried first-snapshot manifest adds 0 files in snapshot 2's
    # list; a falsy `or` would have reported NULL
    assert m["added_files"].notna().all()


# ---- review r4m regression tests (iceberg_meta/avro/iceberg) -------


def test_null_entry_seq_inherits_manifest_seq(tmp_path):
    """Foreign writers record null sequence_number on entries added by
    a manifest (spec inheritance); `or 0` made every data file seq=0 so
    equality deletes applied to nothing (r4m finding)."""
    from geomesa_sql_spark.io.avro import write_avro
    from geomesa_sql_spark.io.iceberg_meta import (
        _MANIFEST_ENTRY_SCHEMA,
        _manifest_entries,
    )

    entry = {
        "status": 1,
        "snapshot_id": 7,
        "sequence_number": None,
        "file_sequence_number": None,
        "data_file": {
            "content": 0,
            "file_path": "/x.parquet",
            "file_format": "PARQUET",
            "partition": {},  # required v2 tuple (r5)
            "record_count": 1,
            "file_size_in_bytes": 10,
            "lower_bounds": None,
            "upper_bounds": None,
            "equality_ids": None,
        },
    }
    mp = str(tmp_path / "m0.avro")
    with open(mp, "wb") as f:
        f.write(write_avro(_MANIFEST_ENTRY_SCHEMA, [entry]))
    got = _manifest_entries(mp, 5)
    assert got[0]["sequence_number"] == 5


def test_equality_delete_null_keys_and_linear_plan(spark, tmp_path):
    """Null delete keys match null rows (Iceberg semantics) and many
    equality-delete files stay a LINEAR chain of anti-joins (the old
    older/newer split doubled the plan per file)."""
    import pandas as pd

    path = str(tmp_path / "eqnull")
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1.0, None, 3.0, 4.0], "v": [10, 20, 30, 40]}),
        "k long, v long",
    )
    im.create_table(df, path)
    im.add_equality_deletes(
        spark, path,
        spark.createDataFrame(pd.DataFrame({"k": [None]}), "k long"),
        on=["k"],
    )
    got = im.IcebergTable.load(path).read(spark).toPandas()
    assert sorted(got["v"]) == [10, 30, 40]  # the NULL-k row deleted
    # 8 more single-key delete commits: linear plan, correct result
    for key in [1, 3, 99, 98, 97, 96, 95, 94]:
        im.add_equality_deletes(
            spark, path,
            spark.createDataFrame([(key,)], "k long"),
            on=["k"],
        )
    got = im.IcebergTable.load(path).read(spark).toPandas()
    assert sorted(got["v"]) == [40]


def test_equality_delete_dropped_key_raises(spark, tmp_path):
    path = str(tmp_path / "eqdrop")
    im.create_table(_mk(spark, 0, 10), path)
    im.add_equality_deletes(
        spark, path, spark.createDataFrame([(3,)], "id long"), on=["id"]
    )
    im.drop_column(path, "id")
    with pytest.raises(ValueError, match="equality-delete"):
        im.IcebergTable.load(path).read(spark).count()


def test_read_table_kwargs_never_silently_dropped(spark, tmp_path):
    from geomesa_sql_spark.io.iceberg import read_table

    pq = str(tmp_path / "plain.parquet")
    spark.range(5).write.parquet(pq)
    with pytest.raises(ValueError, match="not an Iceberg table"):
        read_table(spark, pq, as_of_ms=123)
    # no kwargs: bare parquet still reads
    assert read_table(spark, pq).count() == 5


def test_delete_where_does_not_rescan_kept_footers(spark, tmp_path, monkeypatch):
    """CoW delete cost must be proportional to files REWRITTEN:
    untouched manifest entries re-emit verbatim, no footer re-reads
    (r4m finding: every kept file's footer was re-opened)."""
    from geomesa_sql_spark.io import iceberg_meta as imod

    path = str(tmp_path / "cow")
    imod.create_table(_mk(spark, 0, 100).repartition(10), path)
    calls = []
    orig = imod._parquet_file_stats

    def counting(p, fields):
        calls.append(p)
        return orig(p, fields)

    monkeypatch.setattr(imod, "_parquet_file_stats", counting)
    imod.delete_where(spark, path, "id = 7")
    # only the replacement file(s) for the single hit file get footer
    # stats — never the ~9 kept files
    assert 0 < len(calls) <= 2, calls
    t = imod.IcebergTable.load(path)
    got = t.read(spark).toPandas()
    assert len(got) == 99 and 7 not in set(got["id"])
    # time travel to the pre-delete snapshot still sees 100
    first = sorted(t.snapshots(), key=lambda s: s["sequence-number"])[0]
    assert t.read(spark, snapshot_id=first["snapshot-id"]).count() == 100


def test_avro_empty_rows_zero_blocks():
    from geomesa_sql_spark.io.avro import read_avro, write_avro

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    blob = write_avro(schema, [])
    _, rows, _ = read_avro(blob)
    assert rows == []
    # no data block after the header: the file ends at the header sync
    hdr_only = write_avro(schema, [])
    assert blob == hdr_only and blob.endswith(write_avro(schema, [])[-16:])


def test_stream_checkpoint_restart_resumes_offsets(spark, tmp_path):
    """Offsets persist through Spark's checkpoint: a restarted query
    (same checkpointLocation) reads ONLY snapshots committed after the
    offsets it already processed — the kill-resume law for the Iceberg
    source (north rule: resumable from checkpoint)."""
    path = str(tmp_path / "ice_ckpt")
    ckpt = str(tmp_path / "ckpt")
    im.create_table(_mk(spark, 0, 60), path)
    register_iceberg_source(spark)

    out = str(tmp_path / "out")

    def run_once():
        # parquet sink: the memory sink does not support checkpoint
        # recovery; the file sink gives exactly-once restart semantics
        q = (
            spark.readStream.format("geomesa_iceberg")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 60

    im.append(_mk(spark, 60, 90), path)
    im.append(_mk(spark, 90, 100), path)
    run_once()
    got = spark.read.parquet(out).toPandas()
    # the restarted query resumes from the checkpointed offset: the
    # two new snapshots' 40 rows appended exactly once, never the
    # first 60 again
    assert len(got) == 100 and sorted(got["id"]) == list(range(100))

    # a third restart with nothing new appends nothing
    run_once()
    assert spark.read.parquet(out).count() == 100


def test_foreign_null_seq_equality_delete_end_to_end(spark, tmp_path):
    """End-to-end twin of the seq-inheritance unit test: rewrite a
    table's manifests the way foreign writers emit them (entry
    sequence_number = null, inherited from the manifest list) and
    prove equality deletes still apply (r4m: they were silent no-ops
    at seq=0)."""
    import glob

    from geomesa_sql_spark.io.avro import read_avro, write_avro

    path = str(tmp_path / "ice_foreign")
    im.create_table(_mk(spark, 0, 30), path)
    im.add_equality_deletes(
        spark, path, spark.createDataFrame([(5,), (7,)], "id long"), on=["id"]
    )
    # null out every manifest entry's sequence numbers in place
    for mp in glob.glob(f"{path}/metadata/*-m*.avro") + glob.glob(
        f"{path}/metadata/*.avro"
    ):
        with open(mp, "rb") as f:
            schema_meta, entries, meta = read_avro(f.read())
        if not entries or "data_file" not in entries[0]:
            continue  # manifest lists
        for e in entries:
            e["sequence_number"] = None
            e["file_sequence_number"] = None
        import json as _json

        schema = _json.loads(meta["avro.schema"].decode())
        with open(mp, "wb") as f:
            f.write(write_avro(schema, entries))
    got = im.IcebergTable.load(path).read(spark).toPandas()
    assert sorted(got["id"]) == [i for i in range(30) if i not in (5, 7)]


def _uri_rewrite_manifests(path):
    """Rewrite every manifest's data_file.file_path to a file:// URI,
    the way foreign (JVM) Iceberg writers record paths."""
    import glob
    import json as _json

    from geomesa_sql_spark.io.avro import read_avro, write_avro

    for mp in glob.glob(f"{path}/metadata/*.avro"):
        with open(mp, "rb") as f:
            _, entries, meta = read_avro(f.read())
        if not entries or "data_file" not in entries[0]:
            continue  # manifest lists keep plain paths (opened locally)
        changed = False
        for e in entries:
            p = e["data_file"]["file_path"]
            if not p.startswith("file:"):
                e["data_file"]["file_path"] = "file://" + p
                changed = True
        if changed:
            schema = _json.loads(meta["avro.schema"].decode())
            with open(mp, "wb") as f:
                f.write(write_avro(schema, entries))


def test_foreign_file_uri_equality_delete_end_to_end(spark, tmp_path):
    """Advice r4 (medium): manifests recording file: URIs made seq_df's
    raw path miss the normalized __file join key, __seq went NULL, and
    equality deletes silently resurrected rows. Both sides now share
    _norm_path_py."""
    path = str(tmp_path / "ice_uri")
    im.create_table(_mk(spark, 0, 30), path)
    im.add_equality_deletes(
        spark, path, spark.createDataFrame([(5,), (7,)], "id long"), on=["id"]
    )
    _uri_rewrite_manifests(path)
    got = im.IcebergTable.load(path).read(spark).toPandas()
    assert sorted(got["id"]) == [i for i in range(30) if i not in (5, 7)]


def test_foreign_file_uri_delete_where(spark, tmp_path):
    """delete_where's hit-file targeting must also normalize the
    manifest side: with file: URIs, the hit set (normalized __file)
    never matched raw entry paths, so no manifest was rewritten and
    the delete was a no-op."""
    path = str(tmp_path / "ice_uri_dw")
    im.create_table(_mk(spark, 0, 30), path)
    _uri_rewrite_manifests(path)
    im.delete_where(spark, path, "id < 5")
    got = im.IcebergTable.load(path).read(spark).toPandas()
    assert sorted(got["id"]) == list(range(5, 30))
