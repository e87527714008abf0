"""Pure-Python Iceberg table format (io/avro.py + io/iceberg_meta.py):
generic Avro OCF round trips + mutation robustness, Iceberg create/
append/time-travel, manifest-bounds file pruning, v2 position and
equality deletes (merge-on-read, sequence-number rule), copy-on-write
delete_where, and the io/iceberg.py seam dispatch. Oracles are plain
parquet reads of the same rows."""

import glob
import json
import os
import zlib

import numpy as np
import pytest

from geomesa_sql_spark.io.avro import read_avro, write_avro
from geomesa_sql_spark.io import iceberg_meta as im
from pyspark.sql import functions as F


# ------------------------------------------------------------- avro


def test_avro_roundtrip_all_types():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "l", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "bytes"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "bo", "type": "boolean"},
            {"name": "u", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "fx", "type": {"type": "fixed", "name": "fx8", "size": 4}},
            {"name": "e", "type": {"type": "enum", "name": "col",
                                   "symbols": ["R", "G", "B"]}},
            {"name": "nested", "type": {
                "type": "record", "name": "inner",
                "fields": [{"name": "x", "type": "double"}]}},
            {"name": "ref", "type": ["null", "inner"]},  # named-type ref
        ],
    }
    rows = [
        {"l": -(1 << 40), "i": 7, "s": "héllo", "b": b"\x00\xff", "f": 1.5,
         "d": -2.25, "bo": True, "u": None, "arr": [1, -2, 3],
         "m": {"a": "x", "b": "y"}, "fx": b"abcd", "e": "G",
         "nested": {"x": 9.0}, "ref": None},
        {"l": 0, "i": -1, "s": "", "b": b"", "f": 0.0, "d": 0.0, "bo": False,
         "u": 42, "arr": [], "m": {}, "fx": b"zzzz", "e": "B",
         "nested": {"x": -1.0}, "ref": {"x": 3.5}},
    ]
    for codec in ("null", "deflate"):
        got_schema, got, meta = read_avro(write_avro(schema, rows, codec))
        assert got[0]["l"] == -(1 << 40) and got[0]["fx"] == b"abcd"
        assert got[1]["ref"] == {"x": 3.5} and got[1]["u"] == 42
        assert got[0]["m"] == {"a": "x", "b": "y"}
        assert abs(got[0]["f"] - 1.5) < 1e-9
        assert meta["avro.codec"].decode() == codec
    # empty file and multi-block
    _, got, _ = read_avro(write_avro(schema, []))
    assert got == []
    many = [dict(rows[0], l=k) for k in range(2500)]
    _, got, _ = read_avro(write_avro(schema, many, block_rows=1000))
    assert [r["l"] for r in got] == list(range(2500))


def test_avro_foreign_negative_block_counts():
    """Writers may emit array/map blocks with negative counts (size
    follows) — decode must honor that form even though ours doesn't
    emit it."""
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "arr", "type": {"type": "array", "items": "long"}}]}
    base = write_avro(schema, [{"arr": [5, 6]}], codec="null")
    # body of the single block encodes: count=2 (zigzag 4), 5, 6, end 0
    # rewrite as count=-2 + bytesize=2 + items + 0
    body = bytes([3, 2, 10, 12, 0])  # zigzag(-2)=3, zigzag(1)? no:
    # zigzag: -2 -> 3, size 2 -> 4, 5 -> 10, 6 -> 12, 0 -> 0
    body = bytes([3, 4, 10, 12, 0])
    sync = base[-16:]
    head_end = base.index(sync) + 16
    blob = base[:head_end] + bytes([2, len(body) * 2]) + body + sync
    # count=1 (zigzag 2), size=len(body) (zigzag = 2*len)
    _, rows, _ = read_avro(blob)
    assert rows == [{"arr": [5, 6]}]


def test_avro_mutation_robustness():
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "s", "type": "string"},
        {"name": "v", "type": {"type": "array", "items": "double"}}]}
    rows = [{"s": "x" * 50, "v": [1.0, 2.0]} for _ in range(30)]
    blob = write_avro(schema, rows)
    rng = np.random.default_rng(zlib.crc32(b"avro"))
    for _ in range(120):
        b = bytearray(blob)
        kind = rng.integers(0, 3)
        if kind == 0:
            for _ in range(int(rng.integers(1, 5))):
                b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        elif kind == 1:
            b = b[: int(rng.integers(0, len(b)))]
        else:
            at = int(rng.integers(0, len(b)))
            b = b[:at] + bytearray(rng.bytes(20)) + b[at:]
        try:
            read_avro(bytes(b))
        except (ValueError, NotImplementedError, UnicodeDecodeError):
            pass
        except (IndexError, KeyError, OverflowError, MemoryError) as ex:
            raise AssertionError(f"raw escape: {type(ex).__name__}: {ex}")


# ---------------------------------------------------------- iceberg


def _mkdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("x"),
        F.concat(F.lit("cap-"), F.col("id")).alias("caption"),
    )


def test_iceberg_create_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t1")
    df = _mkdf(spark, 0, 1000).repartition(4)
    t = im.create_table(df, path)
    assert im.IcebergTable.is_iceberg_dir(path)
    got = t.read(spark).orderBy("k").toPandas()
    assert list(got["k"]) == list(range(1000))
    assert got["caption"][5] == "cap-5"
    # generic avro decode of the manifest exposes spec fields
    snap = t.snapshot()
    _, manifests, _ = read_avro(open(snap["manifest-list"], "rb").read())
    assert manifests[0]["added_files_count"] == 4
    _, entries, meta = read_avro(
        open(manifests[0]["manifest_path"], "rb").read()
    )
    assert len(entries) == 4
    assert all(e["data_file"]["file_format"] == "PARQUET" for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == 1000
    assert json.loads(meta["schema"])["fields"][0]["name"] == "k"


def test_iceberg_append_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t2")
    t1 = im.create_table(_mkdf(spark, 0, 100), path)
    s1 = t1.snapshot()["snapshot-id"]
    t2 = im.append(_mkdf(spark, 100, 250), path)
    assert t2.read(spark).count() == 250
    assert t2.read(spark, snapshot_id=s1).count() == 100
    # as-of timestamp resolves to the older snapshot
    ts1 = t1.snapshot()["timestamp-ms"]
    assert t2.read(spark, as_of_ms=ts1).count() == 100
    # the seam routes a table dir through this reader
    from geomesa_sql_spark.io.iceberg import read_table

    assert read_table(spark, path).count() == 250
    assert read_table(spark, path, snapshot_id=s1).count() == 100


def test_iceberg_bounds_pruning(spark, tmp_path):
    path = str(tmp_path / "t3")
    df = _mkdf(spark, 0, 10000).repartitionByRange(8, "k")
    t = im.create_table(df, path)
    data, _, stats = t.plan_files(bounds={"k": (100, 200)})
    assert stats["files_total"] == 8
    assert stats["files_kept"] < 8  # manifest bounds pruned files
    got = t.read(spark, bounds={"k": (100, 200)})
    # pruning is conservative: a residual filter gives exact rows
    assert got.filter("k between 100 and 200").count() == 101
    # every pruned-out file really had no rows in range
    assert got.filter("k between 100 and 200").count() == \
        t.read(spark).filter("k between 100 and 200").count()
    # double bounds prune on x too
    _, _, s2 = t.plan_files(bounds={"x": (0.0, 50.0)})
    assert s2["files_kept"] < 8


def test_iceberg_position_deletes(spark, tmp_path):
    path = str(tmp_path / "t4")
    t = im.create_table(_mkdf(spark, 0, 500).repartition(3), path)
    s1 = t.snapshot()["snapshot-id"]
    data, _, _ = t.plan_files()
    kill = (
        spark.read.parquet(*[f["path"] for f in data])
        .select(
            F.regexp_replace(F.col("_metadata.file_path"), "^file:/*", "/")
            .alias("file_path"),
            F.col("_metadata.row_index").alias("pos"),
            "k",
        )
        .filter(F.col("k") % 7 == 0)
        .drop("k")
    )
    t2 = im.add_position_deletes(spark, path, kill)
    got = t2.read(spark)
    assert got.count() == 500 - len([k for k in range(500) if k % 7 == 0])
    assert got.filter("k % 7 = 0").count() == 0
    # prior snapshot unaffected
    assert t2.read(spark, snapshot_id=s1).filter("k % 7 = 0").count() > 0


def test_iceberg_equality_deletes_sequence_rule(spark, tmp_path):
    path = str(tmp_path / "t5")
    im.create_table(_mkdf(spark, 0, 100), path)
    dels = spark.createDataFrame([(10,), (20,), (999,)], "k long")
    im.add_equality_deletes(spark, path, dels, on=["k"])
    # rows appended AFTER the delete carry a newer sequence number and
    # must survive an identical key (the spec's strictly-older rule)
    t3 = im.append(_mkdf(spark, 10, 11), path)
    got = t3.read(spark)
    assert got.filter("k = 20").count() == 0
    assert got.filter("k = 10").count() == 1  # only the re-added row
    assert got.count() == 100 - 2 + 1


def test_iceberg_delete_where_copy_on_write(spark, tmp_path):
    path = str(tmp_path / "t6")
    t1 = im.create_table(
        _mkdf(spark, 0, 1000).repartitionByRange(5, "k"), path
    )
    s1 = t1.snapshot()["snapshot-id"]
    before = {f["path"] for f in t1.plan_files()[0]}
    t2 = im.delete_where(spark, path, "k between 0 and 99")
    got = t2.read(spark)
    assert got.count() == 900 and got.filter("k < 100").count() == 0
    after = {f["path"] for f in t2.plan_files()[0]}
    # only the file(s) containing k<100 were rewritten
    assert len(before & after) >= 3
    assert t2.read(spark, snapshot_id=s1).count() == 1000
    # NULL predicate rows are kept (SQL DELETE semantics)
    t3 = im.delete_where(
        spark, path, F.when(F.col("k") < 150, True).otherwise(F.lit(None))
    )
    assert t3.read(spark).count() == 850


def test_iceberg_load_rejections(spark, tmp_path):
    with pytest.raises(ValueError, match="no Iceberg metadata"):
        im.IcebergTable.load(str(tmp_path / "nope"))
    path = str(tmp_path / "t7")
    im.create_table(_mkdf(spark, 0, 10), path)
    with pytest.raises(ValueError, match="already an Iceberg table"):
        im.create_table(_mkdf(spark, 0, 10), path)
    t = im.IcebergTable.load(path)
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.snapshot(snapshot_id=424242)
    with pytest.raises(ValueError, match="unknown column"):
        t.plan_files(bounds={"nope": (0, 1)})


def test_iceberg_compact_after_mor_deletes(spark, tmp_path):
    path = str(tmp_path / "t8")
    im.create_table(_mkdf(spark, 0, 300).repartition(4), path)
    dels = spark.createDataFrame([(k,) for k in range(0, 300, 3)], "k long")
    im.add_equality_deletes(spark, path, dels, on=["k"])
    with pytest.raises(ValueError, match="compact first"):
        im.delete_where(spark, path, "k = 1")
    t = im.compact(spark, path)
    assert t.read(spark).count() == 200
    data, deletes, _ = t.plan_files()
    assert not deletes  # MoR deletes folded into plain data files
    # CoW delete usable again; pre-compaction snapshots still readable
    t2 = im.delete_where(spark, path, "k = 1")
    assert t2.read(spark).count() == 199
    first = min(s["snapshot-id"] for s in t2.snapshots())
    assert t2.read(spark, snapshot_id=first).count() == 300


def test_engine_sql_over_iceberg_dir(spark, tmp_path):
    """Engine.register_table on an Iceberg dir: SQL (incl. the spatial
    surface) runs over the snapshot view with v2 deletes applied."""
    from geomesa_sql_spark.engine import Engine

    path = str(tmp_path / "t9")
    df = _mkdf(spark, 0, 400).withColumn(
        "lon", (F.col("k") % 360 - 180.0).cast("double")
    ).withColumn("lat", (F.col("k") % 20 - 10.0).cast("double"))
    im.create_table(df, path)
    im.add_equality_deletes(
        spark, path, spark.createDataFrame([(5,), (6,)], "k long"), on=["k"]
    )
    eng = Engine(spark, fid_col="k")
    eng.register_table("pts", path)
    assert eng.sql("SELECT COUNT(*) AS n FROM pts").collect()[0]["n"] == 398
    got = eng.sql(
        "SELECT k FROM pts WHERE ST_Contains("
        "ST_MakeEnvelope(-10.0, -10.0, 10.0, 10.0), "
        "ST_MakePoint(lon, lat)) ORDER BY k"
    )
    ks = [r["k"] for r in got.collect()]
    want = [
        k for k in range(400)
        if k not in (5, 6)
        and -10 < (k % 360 - 180) < 10 and -10 < (k % 20 - 10) < 10
    ]
    assert ks == want and len(ks) > 0


def test_iceberg_string_upper_bound_truncation_sound(spark, tmp_path):
    """A >16-char string max must not yield an upper bound below the
    real max (Iceberg truncate rule: bump the last kept char) — else
    bounds pruning silently drops matching files."""
    path = str(tmp_path / "t10")
    p16 = "p" * 16
    df = spark.createDataFrame(
        [(p16 + "aaa",), (p16 + "zzz",)], "caption string"
    ).coalesce(1)
    t = im.create_table(df, path)
    data, _, stats = t.plan_files(
        bounds={"caption": (p16 + "yy", p16 + "zzzz")}
    )
    assert stats["files_kept"] == 1  # naive truncation would prune it
    got = t.read(spark, bounds={"caption": (p16 + "yy", p16 + "zzzz")})
    assert got.filter(F.col("caption") == p16 + "zzz").count() == 1
    # recorded bound really is >= the true max
    entries = [
        e
        for m in read_avro(
            open(t.snapshot()["manifest-list"], "rb").read()
        )[1]
        for e in read_avro(open(m["manifest_path"], "rb").read())[1]
    ]
    ub = dict(
        (kv["key"], kv["value"])
        for kv in entries[0]["data_file"]["upper_bounds"]
    )[1].decode()
    assert ub >= p16 + "zzz" and len(ub) <= 16


def test_iceberg_distributed_stats_commit(spark, tmp_path):
    """Past 32 files the commit collects footer stats on executors,
    not in a driver loop; bounds still recorded per file."""
    path = str(tmp_path / "t11")
    t = im.create_table(_mkdf(spark, 0, 4000).repartition(40), path)
    data, _, _ = t.plan_files()
    assert len(data) == 40
    assert t.read(spark).count() == 4000
    _, _, stats = t.plan_files(bounds={"k": (0, 3999)})
    assert stats["files_kept"] == 40  # hash-partitioned: none prunable


def test_geo_iceberg_manifest_bbox_pruning(spark, tmp_path):
    """Spatial x Iceberg: a bbox read prunes files at the manifest
    level via Z-order cell bounds, and matches a plain filter oracle."""
    from geomesa_sql_spark.io.iceberg import (
        read_geo_iceberg,
        write_geo_iceberg,
    )
    from geomesa_sql_spark.io.iceberg_meta import IcebergTable
    from geomesa_sql_spark.plan.filter import cell_prune_ranges

    path = str(tmp_path / "tg")
    df = spark.range(20000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7919 % 36000) / 100.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729 % 17000) / 100.0 - 85.0).alias("lat"),
    )
    write_geo_iceberg(df, path, partitions=16)
    bbox = (10.0, 10.0, 30.0, 25.0)
    t = IcebergTable.load(path)
    ranges = cell_prune_ranges(*bbox, 12)
    _, _, stats = t.plan_files(bounds={"cell": ranges})
    assert stats["files_total"] == 16
    assert stats["files_kept"] < 16  # manifest-level spatial pruning
    got = read_geo_iceberg(spark, path, bbox=bbox).orderBy("k")
    want = df.filter(
        (F.col("lon") >= 10.0) & (F.col("lon") <= 30.0)
        & (F.col("lat") >= 10.0) & (F.col("lat") <= 25.0)
    ).orderBy("k")
    assert [r["k"] for r in got.collect()] == [r["k"] for r in want.collect()]
    assert got.count() > 0
    # superset mode: cover >= exact
    cover = read_geo_iceberg(spark, path, bbox=bbox, exact=False)
    assert cover.count() >= got.count()
    # properties survive an append (carried forward)
    from geomesa_sql_spark.io import iceberg_meta as im2

    im2.append(
        df.limit(10).withColumn(
            "cell",
            __import__(
                "geomesa_sql_spark.cells.column", fromlist=["zorder_cell_col"]
            ).zorder_cell_col(F.col("lon"), F.col("lat"), 12),
        ),
        path,
    )
    t2 = IcebergTable.load(path)
    assert t2.metadata["properties"]["geo.cell.res"] == "12"


def test_iceberg_expire_snapshots(spark, tmp_path):
    path = str(tmp_path / "t12")
    im.create_table(_mkdf(spark, 0, 100), path)
    im.append(_mkdf(spark, 100, 200), path)
    t3 = im.delete_where(spark, path, "k < 50")
    all_snaps = [s["snapshot-id"] for s in t3.snapshots()]
    stats = im.expire_snapshots(path, keep_last=1)
    assert stats["expired"] == 2 and stats["files_removed"] > 0
    t = im.IcebergTable.load(path)
    # current snapshot intact, reads fine
    assert t.read(spark).count() == 150
    assert [s["snapshot-id"] for s in t.snapshots()] == [all_snaps[-1]]
    # expired snapshots no longer addressable
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.read(spark, snapshot_id=all_snaps[0])
    # kept-referenced files survive: snapshot-3 carries snapshot-2's
    # untouched data files as existing entries, so those still read
    data, _, _ = t.plan_files()
    for f in data:
        assert os.path.exists(f["path"])


# -------------------------------------------------- schema evolution


def test_iceberg_rename_column_id_resolution(spark, tmp_path):
    """Files written before AND after a rename resolve through the
    shared field-id: one read sees one column with all the data."""
    path = str(tmp_path / "ev1")
    im.create_table(_mkdf(spark, 0, 100), path)
    assert im.IcebergTable.load(path).field_ids
    im.rename_column(path, "caption", "title")
    t = im.IcebergTable.load(path)
    assert [f["name"] for f in t.schema_fields()] == ["k", "x", "title"]
    # old files' data lands in the renamed column
    got = t.read(spark).orderBy("k").toPandas()
    assert list(got.columns) == ["k", "x", "title"]
    assert got["title"].iloc[7] == "cap-7"
    # append after the rename (new files carry the new name + same id)
    im.append(
        _mkdf(spark, 100, 200).withColumnRenamed("caption", "title"), path
    )
    got = im.IcebergTable.load(path).read(spark).orderBy("k").toPandas()
    assert len(got) == 200 and got["title"].iloc[150] == "cap-150"
    # copy-on-write delete across the mixed-name files still works
    im.delete_where(spark, path, "title = 'cap-50'")
    assert im.IcebergTable.load(path).read(spark).count() == 199


def test_iceberg_add_drop_column_no_resurrection(spark, tmp_path):
    path = str(tmp_path / "ev2")
    im.create_table(_mkdf(spark, 0, 50), path)
    # ADD: existing rows read NULL
    im.add_column(path, "score", "double")
    t = im.IcebergTable.load(path)
    got = t.read(spark).toPandas()
    assert got["score"].isna().all()
    # DROP then re-ADD the same name: fresh field-id, old data must
    # NOT come back
    im.drop_column(path, "caption")
    assert im.IcebergTable.load(path).read(spark).columns == [
        "k", "x", "score"
    ]
    im.add_column(path, "caption", "string")
    t = im.IcebergTable.load(path)
    ids = {f["name"]: f["id"] for f in t.schema_fields()}
    assert ids["caption"] > ids["score"]  # retired id never reused
    got = t.read(spark).toPandas()
    assert got["caption"].isna().all()
    # appends under the evolved schema carry real values
    im.append(
        _mkdf(spark, 50, 60).withColumn("score", F.lit(1.5))
        .select("k", "x", "score", "caption"), path
    )
    got = im.IcebergTable.load(path).read(spark).orderBy("k").toPandas()
    assert got["caption"].iloc[55] == "cap-55"
    assert got["score"].iloc[55] == 1.5 and np.isnan(got["score"].iloc[5])


def test_iceberg_evolution_validation(spark, tmp_path):
    path = str(tmp_path / "ev3")
    im.create_table(_mkdf(spark, 0, 10), path)
    with pytest.raises(ValueError, match="already exists"):
        im.add_column(path, "k", "long")
    with pytest.raises(ValueError, match="unsupported type"):
        im.add_column(path, "z", "struct")
    with pytest.raises(ValueError, match="unknown column"):
        im.rename_column(path, "nope", "x2")
    with pytest.raises(ValueError, match="already exists"):
        im.rename_column(path, "k", "x")
    with pytest.raises(ValueError, match="unknown column"):
        im.drop_column(path, "nope")
    # non-primitive table: no field ids, evolution refuses
    path2 = str(tmp_path / "ev4")
    arr_df = spark.range(5).select(
        F.col("id").alias("k"), F.array(F.lit(1.0)).alias("emb")
    )
    im.create_table(arr_df, path2)
    assert not im.IcebergTable.load(path2).field_ids
    with pytest.raises(ValueError, match="field-id"):
        im.rename_column(path2, "k", "key")
    # name-based read still round-trips the opaque table
    assert im.IcebergTable.load(path2).read(spark).count() == 5


def test_iceberg_pruning_survives_rename(spark, tmp_path):
    """File bounds recorded pre-rename are keyed by field-id, so a
    bounds query on the NEW name still prunes the old files."""
    path = str(tmp_path / "ev5")
    im.create_table(_mkdf(spark, 0, 100).repartition(1), path)
    im.append(_mkdf(spark, 100, 200).repartition(1), path)
    im.rename_column(path, "k", "key")
    t = im.IcebergTable.load(path)
    data, _, stats = t.plan_files(bounds={"key": (150, 160)})
    assert stats["files_total"] == 2 and stats["files_kept"] == 1
    got = t.read(spark, bounds={"key": (150, 160)})
    assert got.filter("key = 155").count() == 1
    # stats of files REWRITTEN post-rename (delete_where existing
    # entries) also key by id via the embedded parquet field ids
    im.delete_where(spark, path, "key >= 190")
    data, _, stats = im.IcebergTable.load(path).plan_files(
        bounds={"key": (0, 50)}
    )
    assert stats["files_kept"] == 1


# ---------------------------------------------- Engine DML over Iceberg


def test_engine_dml_over_iceberg_table(spark, tmp_path):
    """Every Engine DML verb (API + SQL text) commits real Iceberg
    snapshots when the registered table is an Iceberg dir."""
    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark, fid_col="k")
    path = str(tmp_path / "dml_ice")
    eng.create_table(
        "tice", path, _mkdf(spark, 0, 100).repartitionByRange(4, "k"),
        format="iceberg",
    )
    # INSERT (SQL text, VALUES form)
    n = eng.sql(
        "INSERT INTO tice VALUES (100, 200.0, 'cap-100')"
    ).collect()[0][0]
    assert n == 1
    # UPDATE with predicate
    n = eng.sql("UPDATE tice SET x = x + 0.5 WHERE k >= 50").collect()[0][0]
    assert n == 51
    got = eng.sql("SELECT x FROM tice WHERE k = 60").collect()[0][0]
    assert got == 120.5
    # DELETE with subquery predicate (fid-frame path)
    n = eng.sql(
        "DELETE FROM tice WHERE k IN (SELECT k FROM tice WHERE k < 10)"
    ).collect()[0][0]
    assert n == 10
    # MERGE upsert
    src = spark.createDataFrame(
        [(20, 9.0, "new-20"), (500, 1.0, "new-500")], "k long, x double, caption string"
    )
    n_upd, n_ins = eng.merge("tice", src)
    assert (n_upd, n_ins) == (1, 1)
    df = eng.df("tice")
    assert df.count() == 92  # 101 - 10 + 1
    assert df.filter("k = 20").collect()[0]["caption"] == "new-20"
    # the whole history is real Iceberg: time travel to snapshot 1
    t = im.IcebergTable.load(path)
    assert len(t.snapshots()) == 5  # create+insert+update+delete+merge
    first = t.snapshots()[0]["snapshot-id"]
    assert t.read(spark, snapshot_id=first).count() == 100


def test_engine_iceberg_delete_is_file_targeted(spark, tmp_path):
    """A Column-predicate DELETE rewrites only the files containing
    matches — untouched files survive into the new snapshot."""
    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark, fid_col="k")
    path = str(tmp_path / "dml_ice2")
    eng.create_table(
        "tice2", path, _mkdf(spark, 0, 1000).repartitionByRange(8, "k"),
        format="iceberg",
    )
    t0 = im.IcebergTable.load(path)
    files0 = {d["path"] for d in t0.plan_files()[0]}
    n = eng.delete("tice2", F.col("k") < 100)
    assert n == 100
    t1 = im.IcebergTable.load(path)
    files1 = {d["path"] for d in t1.plan_files()[0]}
    assert files0 & files1, "expected untouched files to be carried over"
    assert eng.df("tice2").count() == 900


def test_engine_iceberg_compact_counts(spark, tmp_path):
    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark, fid_col="k")
    path = str(tmp_path / "dml_ice3")
    eng.create_table(
        "tice3", path, _mkdf(spark, 0, 200).repartition(6), format="iceberg"
    )
    assert eng.compact("tice3", target_files=2) == 2
    assert eng.df("tice3").count() == 200


def test_iceberg_promote_column(spark, tmp_path):
    """int→long / float→double promotion: metadata-only; old 4-byte
    files widen on read and their recorded bounds still prune."""
    path = str(tmp_path / "ev6")
    df = spark.range(0, 100).selectExpr(
        "cast(id as int) as k", "cast(id as float) as v"
    )
    im.create_table(df.repartitionByRange(2, "k"), path)
    with pytest.raises(ValueError, match="illegal promotion"):
        im.promote_column(path, "v", "long")
    im.promote_column(path, "k", "long")
    im.promote_column(path, "v", "double")
    t = im.IcebergTable.load(path)
    got = t.read(spark)
    assert dict(got.dtypes) == {"k": "bigint", "v": "double"}
    assert got.count() == 100
    # wide appends coexist with narrow files
    im.append(
        spark.range(100, 200).selectExpr(
            "id as k", "cast(id as double) as v"
        ),
        path,
    )
    t = im.IcebergTable.load(path)
    assert t.read(spark).agg(F.sum("k")).collect()[0][0] == sum(range(200))
    # pre-promotion 4-byte bounds decode + prune under the wide type
    _, _, stats = t.plan_files(bounds={"k": (10, 20)})
    assert stats["files_kept"] == 1 and stats["files_total"] >= 3


def test_streaming_upsert_drains_into_iceberg(spark, sf_dir, tmp_path):
    """drain_merge_into over an Iceberg-backed Engine table: each
    micro-batch MERGE commits a real Iceberg snapshot; the final table
    equals the batch aggregate."""
    from geomesa_sql_spark.engine import Engine
    from geomesa_sql_spark.io.dml import IcebergDmlTable
    from geomesa_sql_spark.streaming import (
        drain_merge_into,
        stateful_running_totals,
    )

    eng = Engine(spark, fid_col="event_type")
    d = str(tmp_path / "ev")
    t_path = str(tmp_path / "tot_ice")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    )
    ev.repartition(4).write.parquet(d)
    empty = spark.createDataFrame(
        [], "event_type string, total_n long, total_value double"
    )
    IcebergDmlTable(spark, t_path, fid_col="event_type").create(empty)
    eng.register_table("totals_ice", t_path)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = drain_merge_into(
        stateful_running_totals(stream), eng, "totals_ice", on="event_type"
    )
    want = {
        r.event_type: (r.n, round(r.v, 6))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    res = {
        r.event_type: (r.total_n, round(r.total_value, 6))
        for r in got.collect()
    }
    assert res == want
    # one real Iceberg snapshot per non-empty micro-batch + create
    t = im.IcebergTable.load(t_path)
    assert len(t.snapshots()) >= 3


def test_iceberg_rollback(spark, tmp_path):
    path = str(tmp_path / "rb")
    im.create_table(_mkdf(spark, 0, 100), path)
    im.append(_mkdf(spark, 100, 200), path)
    im.delete_where(spark, path, "k < 150")
    snaps = im.IcebergTable.load(path).snapshots()
    assert im.IcebergTable.load(path).read(spark).count() == 50
    # restore to the post-append snapshot
    t = im.rollback(path, snapshot_id=snaps[1]["snapshot-id"])
    assert t.read(spark).count() == 200
    # nothing deleted: the rolled-past delete stays time-travelable
    assert t.read(spark, snapshot_id=snaps[2]["snapshot-id"]).count() == 50
    # new commits build on the restored state
    im.append(_mkdf(spark, 200, 210), path)
    assert im.IcebergTable.load(path).read(spark).count() == 210
