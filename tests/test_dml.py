"""DML round-trips re-expressing the reference's ModificationTest
(test/.../ModificationTest.scala:36-175): insert incl. nulls / partial
columns / INSERT-SELECT, update with FID prohibition, delete, and exact
affected-row counts — plus snapshot isolation (our Iceberg-shaped
extension)."""

import pytest
from pyspark.sql import functions as F

from geomesa_sql_spark.io.dml import FidUpdateError, SnapshotTable


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    base = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select(
            F.col("n_nationkey").cast("long").alias("fid"),
            "n_name",
            "n_regionkey",
        )
    )
    return SnapshotTable(spark, str(tmp_path / "t"), fid_col="fid").create(base)


def test_insert_full_and_count(spark, table):
    n0 = table.read().count()
    rows = spark.createDataFrame(
        [(1000, "ATLANTIS", 0), (1001, "LEMURIA", 1)],
        "fid long, n_name string, n_regionkey long",
    )
    assert table.insert(rows) == 2
    got = table.read()
    assert got.count() == n0 + 2
    assert got.filter(F.col("fid") == 1000).select("n_name").first()[0] == "ATLANTIS"


def test_insert_partial_columns_null_filled(spark, table):
    rows = spark.createDataFrame([(2000,)], "fid long")
    assert table.insert(rows) == 1
    r = table.read().filter(F.col("fid") == 2000).first()
    assert r["n_name"] is None and r["n_regionkey"] is None


def test_insert_unknown_column_rejected(spark, table):
    rows = spark.createDataFrame([(1, "x")], "fid long, bogus string")
    with pytest.raises(ValueError, match="bogus"):
        table.insert(rows)


def test_insert_select_1000(spark, sf_dir, table):
    # ModificationTest.scala: INSERT ... SELECT of 1000 generated rows
    src = spark.range(10_000, 11_000).select(
        F.col("id").alias("fid"),
        F.concat(F.lit("N"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).alias("n_regionkey"),
    )
    assert table.insert(src) == 1000
    assert table.read().filter(F.col("fid") >= 10_000).count() == 1000


def test_update_with_where_and_count(spark, table):
    n_hit = table.read().filter(F.col("n_regionkey") == 2).count()
    affected = table.update(
        {"n_name": F.lower("n_name")}, where=F.col("n_regionkey") == 2
    )
    assert affected == n_hit
    got = table.read()
    assert got.filter((F.col("n_regionkey") == 2) & (F.col("n_name") != F.lower("n_name"))).count() == 0
    assert got.filter((F.col("n_regionkey") != 2) & (F.col("n_name") == F.lower("n_name"))).count() == 0


def test_update_all_rows_sql_expr(spark, table):
    n = table.read().count()
    assert table.update({"n_regionkey": "n_regionkey + 100"}) == n
    assert table.read().filter(F.col("n_regionkey") < 100).count() == 0


def test_update_fid_forbidden(table):
    with pytest.raises(FidUpdateError):
        table.update({"fid": F.lit(0)})


def test_update_set_frame_rejects_dup_fid_and_missing_value(spark, table):
    """r5 review: a SET-side (fid, value) frame with duplicate fids
    would silently MULTIPLY whole table rows through the CoW join —
    fail like ANSI scalar subqueries do on >1 row (the check is a
    raise_error folded into the consumed value over ONE aggregation:
    no extra job, no double evaluation of the frame; it fires at
    commit time, BEFORE _CURRENT flips, so the table is untouched);
    a frame with no value column errors clearly, not an IndexError."""
    good = spark.createDataFrame([(1, 5), (2, 6)], "fid long, v int")
    before = table.read().count()
    assert table.update({"n_regionkey": good}) == before  # sanity: ok
    assert table.read().count() == before

    dup = spark.createDataFrame([(1, 5), (1, 6)], "fid long, v int")
    with pytest.raises(Exception, match="duplicate"):
        table.update({"n_regionkey": dup})
    # nothing committed: same row count AND the live version readable
    assert table.read().count() == before

    with pytest.raises(ValueError, match="value"):
        table.update({"n_regionkey": spark.createDataFrame([(1,)], "fid long")})


def test_delete_with_count_and_null_cond(spark, table):
    table.insert(spark.createDataFrame([(3000,)], "fid long"))  # null n_regionkey
    n_hit = table.read().filter(F.col("n_regionkey") == 0).count()
    assert table.delete(F.col("n_regionkey") == 0) == n_hit
    got = table.read()
    assert got.filter(F.col("n_regionkey") == 0).count() == 0
    # NULL condition row survives a DELETE (SQL three-valued logic)
    assert got.filter(F.col("fid") == 3000).count() == 1


def test_snapshot_isolation_time_travel(spark, table):
    v0 = table.read()
    n0 = v0.count()
    table.delete(None)
    assert table.read().count() == 0
    # old snapshot still fully readable
    assert table.read(version=0).count() == n0
    # and the handle captured before the commit still resolves
    assert v0.count() == n0


def test_insert_coerces_types_to_table_schema(spark, table):
    """ADVICE r01 (high): an INSERT whose column types differ from the
    table schema must be coerced before the data dir is written —
    otherwise the commit succeeds and every later read() dies on
    PARQUET_COLUMN_DATA_TYPE_MISMATCH. Calcite coerces inserts to the
    table row type, so this is also reference parity."""
    # table columns: fid long, n_name string, n_regionkey int32
    rows = spark.createDataFrame(
        [(3000, "TYPED", 7.0)], "fid int, n_name string, n_regionkey double"
    )
    assert table.insert(rows) == 1
    got = table.read()  # would raise without the insert-side cast
    assert got.count() > 0
    r = got.filter(F.col("fid") == 3000).first()
    assert r["n_regionkey"] == 7
    assert dict(got.dtypes)["n_regionkey"] == "int"


def test_insert_non_castable_rejected(spark, table):
    rows = spark.createDataFrame([(1, [2, 3])], "fid long, n_regionkey array<int>")
    with pytest.raises(ValueError, match="not coercible"):
        table.insert(rows)


def test_merge_upsert_counts_and_values(spark, table):
    """MERGE = partial-row update for matched keys + insert for new
    keys, one atomic commit, exact counts, old snapshot intact."""
    v0 = table._current_version()
    n0 = table.read().count()
    src = spark.createDataFrame(
        [(0, "ZERO_PRIME"), (1, "ONE_PRIME"), (5000, "NEWLAND")],
        "fid long, n_name string",  # n_regionkey NOT provided
    )
    n_upd, n_ins = table.merge(src)
    assert (n_upd, n_ins) == (2, 1)
    got = table.read()
    assert got.count() == n0 + 1
    row0 = got.filter(F.col("fid") == 0).first()
    assert row0.n_name == "ZERO_PRIME"
    assert row0.n_regionkey is not None  # unprovided column kept
    new = got.filter(F.col("fid") == 5000).first()
    assert new.n_name == "NEWLAND" and new.n_regionkey is None
    # time travel: pre-merge snapshot unchanged
    old = table.read(version=v0)
    assert old.count() == n0
    assert old.filter(F.col("fid") == 0).first().n_name != "ZERO_PRIME"


def test_merge_modes_and_duplicate_keys(spark, table):
    src = spark.createDataFrame(
        [(0, "X"), (6000, "Y")], "fid long, n_name string"
    )
    assert table.merge(src, when_matched="ignore") == (0, 1)
    assert table.read().filter(F.col("fid") == 0).first().n_name != "X"
    assert table.merge(src, when_not_matched="ignore") == (2, 0)

    dup = spark.createDataFrame(
        [(7000, "A"), (7000, "B")], "fid long, n_name string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        table.merge(dup)
    with pytest.raises(ValueError, match="lacks key"):
        table.merge(spark.createDataFrame([("Z",)], "n_name string"))


def test_compact_small_files(spark, table):
    """Many single-row appends -> compaction to one dir/few files with
    identical data; the pre-compaction snapshot stays readable."""
    for i in range(5):
        table.insert(spark.createDataFrame(
            [(9000 + i, f"N{i}", 0)], "fid long, n_name string, n_regionkey long"
        ))
    before = {tuple(r) for r in table.read().collect()}
    v_before = table._current_version()
    n_dirs_before = len(table._load_manifest(v_before)["dirs"])
    assert n_dirs_before >= 6
    n_files = table.compact(target_files=2)
    assert n_files == 2
    m = table._load_manifest(table._current_version())
    assert len(m["dirs"]) == 1
    assert {tuple(r) for r in table.read().collect()} == before
    assert table.read(version=v_before).count() == len(before)


def test_sql_text_merge(spark, sf_dir, tmp_path):
    """Engine.sql MERGE INTO text form: canonical key upsert."""
    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark)
    base = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select(F.col("n_nationkey").cast("long").alias("image_id"), "n_name")
    )
    d = str(tmp_path / "mt")
    SnapshotTable(spark, d).create(base)
    eng.register_table("mtab", d)
    eng.register_view(
        "msrc",
        spark.createDataFrame(
            [(0, "ZED"), (4242, "NEW")], "image_id long, n_name string"
        ),
    )
    out = eng.sql("MERGE INTO mtab USING msrc ON image_id")
    assert out.first().affected == 2
    got = {r.image_id: r.n_name for r in eng.sql(
        "SELECT image_id, n_name FROM mtab WHERE image_id IN (0, 4242)"
    ).collect()}
    assert got == {0: "ZED", 4242: "NEW"}

    # WHEN NOT MATCHED only: existing row untouched, new row added
    eng.register_view(
        "msrc2",
        spark.createDataFrame(
            [(0, "IGNORED"), (5555, "ADDED")], "image_id long, n_name string"
        ),
    )
    out2 = eng.sql(
        "MERGE INTO mtab USING msrc2 ON image_id WHEN NOT MATCHED THEN INSERT"
    )
    assert out2.first().affected == 1
    got2 = {r.image_id: r.n_name for r in eng.sql(
        "SELECT image_id, n_name FROM mtab WHERE image_id IN (0, 5555)"
    ).collect()}
    assert got2 == {0: "ZED", 5555: "ADDED"}

    # subquery source
    out3 = eng.sql(
        "MERGE INTO mtab USING "
        "(SELECT 7777 AS image_id, 'SUBQ' AS n_name) ON image_id"
    )
    assert out3.first().affected == 1


def test_merge_set_list_sql_and_api(spark, sf_dir, tmp_path):
    """r3: MERGE ... WHEN MATCHED THEN UPDATE SET col = expr — only
    the SET columns update, expressions mix target and source values,
    inserts are unaffected; API twin via set_exprs."""
    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark, fid_col="n_nationkey")
    base = spark.read.parquet(f"{sf_dir}/nation.parquet")
    eng.create_table("mset", str(tmp_path / "mset"), base)

    upd = base.filter("n_nationkey < 5").select(
        "n_nationkey",
        F.lit("ZZ").alias("n_name"),
        (F.col("n_regionkey") + 100).alias("n_regionkey"),
    )
    ins = spark.createDataFrame([(900, "NEW", 1)], base.schema)
    eng.register_view("msrc", upd.unionByName(ins))

    out = eng.sql(
        "MERGE INTO mset t USING msrc s ON n_nationkey "
        "WHEN MATCHED THEN UPDATE SET "
        "  n_name = concat(t.n_name, '_', s.n_name), "
        "  n_regionkey = n_regionkey + s.n_regionkey "
        "WHEN NOT MATCHED THEN INSERT"
    )
    assert out.first()["affected"] == 5 + 1
    got = {r.n_nationkey: (r.n_name, r.n_regionkey)
           for r in eng.df("mset").collect()}
    want_base = {r.n_nationkey: (r.n_name, r.n_regionkey)
                 for r in base.collect()}
    for k, (nm, rk) in want_base.items():
        if k < 5:
            assert got[k] == (f"{nm}_ZZ", rk + (rk + 100)), k
        else:
            assert got[k] == (nm, rk), k
    assert got[900] == ("NEW", 1)

    # API twin: set_exprs dict, matched-only (no insert)
    eng2 = Engine(spark, fid_col="n_nationkey")
    eng2.create_table("mset2", str(tmp_path / "mset2"), base)
    n_upd, n_ins = eng2.merge(
        "mset2", upd, on="n_nationkey",
        when_not_matched="ignore",
        set_exprs={"n_name": "lower(src.n_name)"},
    )
    assert (n_upd, n_ins) == (5, 0)
    got2 = {r.n_nationkey: (r.n_name, r.n_regionkey)
            for r in eng2.df("mset2").collect()}
    for k, (nm, rk) in want_base.items():
        # n_regionkey must NOT have updated (not in the SET list)
        assert got2[k] == ("zz" if k < 5 else nm, rk), k

    # SET on unknown column / on the key: loud errors
    import pytest as _pt
    with _pt.raises(ValueError, match="unknown columns|SET targets"):
        eng2.merge("mset2", upd, on="n_nationkey",
                   set_exprs={"nope": "1"})
    with _pt.raises(ValueError, match="MERGE key"):
        eng2.merge("mset2", upd, on="n_nationkey",
                   set_exprs={"n_nationkey": "0"})


def test_merge_set_literal_and_src_collision_guards(spark, sf_dir, tmp_path):
    """Review r3: SET-list qualifier rewriting must not touch string
    literals, and a target named 'src' (the source-qualifier
    convention) is refused loudly."""
    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark, fid_col="n_nationkey")
    base = spark.read.parquet(f"{sf_dir}/nation.parquet")
    eng.create_table("mlit", str(tmp_path / "mlit"), base)
    upd = base.filter("n_nationkey = 3").select("n_nationkey")
    eng.register_view("s", upd)

    # literal containing 's.' survives untouched
    eng.sql(
        "MERGE INTO mlit t USING s ON n_nationkey "
        "WHEN MATCHED THEN UPDATE SET n_name = 'see s.mail'"
    )
    got = {r.n_nationkey: r.n_name for r in eng.df("mlit").collect()}
    assert got[3] == "see s.mail"

    eng.create_table("src", str(tmp_path / "src"), base)
    eng.register_view("u", upd)
    with pytest.raises(ValueError, match="src"):
        eng.sql(
            "MERGE INTO src USING u ON n_nationkey "
            "WHEN MATCHED THEN UPDATE SET n_name = 'x'"
        )


def test_merge_set_exprs_validation(spark, tmp_path):
    """r3b: src.<col> references in SET expressions are validated
    against the source's columns up front (clean ValueError, not an
    opaque mangled-column analysis error); a literal mentioning
    'src.x' is NOT a reference; set_exprs with when_matched='ignore'
    raises instead of silently dropping the SET list."""
    import pytest as _pytest

    d = str(tmp_path / "msv")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "image_id long, n string, price double"
    )
    t = SnapshotTable(spark, d).create(base)
    src = spark.createDataFrame([(1, 9.0)], "image_id long, price double")

    t.merge(src, set_exprs={"price": "src.price * 2"})
    assert {r.image_id: r.price for r in t.read().collect()}[1] == 18.0

    with _pytest.raises(ValueError, match="qty"):
        t.merge(src, set_exprs={"price": "src.qty * 2"})
    with _pytest.raises(ValueError, match="silently dropped"):
        t.merge(src, when_matched="ignore", set_exprs={"price": "src.price"})

    t.merge(src, set_exprs={"n": "'src.fake'"})  # literal, not a ref
    assert {r.image_id: r.n for r in t.read().collect()}[1] == "src.fake"


def test_write_geo_table_rejects_precomputed_cell(spark, tmp_path):
    """r3b: a frame already carrying 'cell' is refused — the recorded
    layout res could silently disagree with the encode res, making the
    pushdown scan drop every row."""
    import pytest as _pytest

    from geomesa_sql_spark.io.layout import add_cell, write_geo_table

    df = add_cell(
        spark.createDataFrame([(1, 0.0, 0.0)], "id long, lon double, lat double"),
        "lon", "lat", 8,
    )
    with _pytest.raises(ValueError, match="cell"):
        write_geo_table(df, str(tmp_path / "bad"))


def test_fast_min_max_refuses_int96(spark, tmp_path):
    """r3b: INT96 footer stats are deprecated (undefined sort order) —
    fast_min_max must fall back to a scan (return None) instead of
    trusting them."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geomesa_sql_spark.io.stats import fast_min_max

    d = str(tmp_path / "i96")
    tbl = pa.table(
        {"ts": pd.to_datetime(["2024-01-01", "2024-06-01"]), "v": [1, 2]}
    )
    import os
    os.makedirs(d)
    pq.write_table(
        tbl, f"{d}/part-0.parquet", use_deprecated_int96_timestamps=True
    )
    assert fast_min_max(d, "ts") is None      # INT96: refused
    assert fast_min_max(d, "v") == (1, 2)     # INT64: still exact


def test_dml_differential_fuzz(spark, sf_dir, tmp_path):
    """Seeded random INSERT/UPDATE/DELETE statement sequences run
    verbatim through BOTH Engine.sql and DuckDB on the same starting
    table; final table states must match exactly (the ModificationTest
    round-trip idea generalized to a generator — covers SET expression
    evaluation, LIKE/IN/MOD predicates, subquery WHERE forms, and
    duplicate-key inserts)."""
    import random

    import duckdb

    from geomesa_sql_spark.engine import Engine

    eng = Engine(spark, fid_col="n_nationkey")
    base = spark.read.parquet(f"{sf_dir}/nation.parquet")
    eng.create_table("natf", str(tmp_path / "natf"), base)
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE natf AS SELECT * FROM '{sf_dir}/nation.parquet'"
    )

    rng = random.Random(424242)

    def gen(i: int) -> str:
        kind = rng.random()
        if kind < 0.3:
            k = rng.choice([100 + i, rng.randrange(0, 25)])  # dup keys too
            return (
                f"INSERT INTO natf VALUES ({k}, 'FUZZ_{i}', "
                f"{rng.randrange(0, 5)})"
            )
        if kind < 0.65:
            set_expr = rng.choice(
                [
                    "n_name = UPPER(n_name)",
                    "n_name = n_name || '_X'",
                    "n_regionkey = n_regionkey + 1",
                    "n_regionkey = MOD(n_regionkey * 3, 5)",
                ]
            )
            pred = rng.choice(
                [
                    f"n_regionkey = {rng.randrange(0, 5)}",
                    "n_name LIKE '%A%'",
                    f"n_nationkey IN ({rng.randrange(0, 25)}, "
                    f"{rng.randrange(0, 25)})",
                    f"MOD(n_nationkey, 7) = {rng.randrange(0, 7)}",
                ]
            )
            return f"UPDATE natf SET {set_expr} WHERE {pred}"
        pred = rng.choice(
            [
                f"MOD(n_nationkey, 11) = {rng.randrange(0, 11)}",
                f"n_regionkey = {rng.randrange(0, 5)} AND n_name LIKE 'F%'",
                "n_nationkey IN (SELECT n_nationkey FROM natf "
                f"WHERE n_regionkey = {rng.randrange(0, 5)} "
                "AND MOD(n_nationkey, 2) = 0)",
            ]
        )
        return f"DELETE FROM natf WHERE {pred}"

    def state_eng():
        return sorted(
            tuple(str(v) for v in r) for r in eng.df("natf").collect()
        )

    def state_duck():
        return sorted(
            tuple(str(v) for v in r)
            for r in con.execute("SELECT * FROM natf").fetchall()
        )

    for i in range(14):
        stmt = gen(i)
        eng.sql(stmt)
        con.execute(stmt)
        if i % 5 == 4 or i == 13:
            assert state_eng() == state_duck(), f"diverged after: {stmt}"
