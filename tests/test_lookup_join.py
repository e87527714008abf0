"""Index-lookup join (J3/J4 analog) — result parity vs a plain join,
LEFT null padding, residual re-check, first-key-only pushdown, and the
plan-shape assertion that the key set actually reaches the parquet scan
(the analog of the reference's EXPLAIN regex tests,
GeoMesaCalciteTestUtils.scala:41-52)."""

import pytest
from pyspark.sql import functions as F

from geomesa_sql_spark.join.lookup import index_lookup_join


@pytest.fixture(scope="module")
def sides(spark, sf_dir):
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_acctbal") > 9000.0)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return cust, orders


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_matches_plain_join(spark, sides):
    cust, orders = sides
    got = index_lookup_join(cust, orders, ("c_custkey", "o_custkey"))
    want = cust.join(orders, cust.c_custkey == orders.o_custkey)
    assert _sorted_rows(got.select("c_custkey", "o_orderkey")) == _sorted_rows(
        want.select("c_custkey", "o_orderkey")
    )


def test_keys_pushed_into_scan(spark, sides):
    cust, orders = sides
    got = index_lookup_join(cust, orders, ("c_custkey", "o_custkey"))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(o_custkey" in plan, plan[:2000]


def test_above_threshold_no_pushdown(spark, sides):
    cust, orders = sides
    got = index_lookup_join(cust, orders, ("c_custkey", "o_custkey"), max_push_keys=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(o_custkey" not in plan
    want = cust.join(orders, cust.c_custkey == orders.o_custkey)
    assert got.count() == want.count()


def test_left_null_padding(spark, sides):
    cust, orders = sides
    big = orders.filter(F.col("o_totalprice") > 400000.0)
    got = index_lookup_join(cust, big, ("c_custkey", "o_custkey"), how="left")
    want = cust.join(big, cust.c_custkey == big.o_custkey, "left")
    assert _sorted_rows(got.select("c_custkey", "o_orderkey")) == _sorted_rows(
        want.select("c_custkey", "o_orderkey")
    )
    assert got.filter(F.col("o_orderkey").isNull()).count() > 0


def test_residual_inner_and_left(spark, sides):
    cust, orders = sides
    residual = F.col("o_totalprice") > F.col("c_acctbal") * 20
    got = index_lookup_join(cust, orders, ("c_custkey", "o_custkey"), residual=residual)
    want = cust.join(orders, cust.c_custkey == orders.o_custkey).filter(residual)
    assert got.count() == want.count()

    got_l = index_lookup_join(
        cust, orders, ("c_custkey", "o_custkey"), how="left", residual=residual
    )
    # every left row appears; rows with no surviving match are null-padded
    assert got_l.select("c_custkey").distinct().count() == cust.count()
    matched_keys = {r[0] for r in want.select("c_custkey").distinct().collect()}
    nulls = {r[0] for r in got_l.filter(F.col("o_orderkey").isNull())
             .select("c_custkey").collect()}
    assert nulls.isdisjoint(matched_keys)


def test_compound_key_first_only_pushed(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    left = o.filter(F.col("o_orderkey") <= 50).select(
        F.col("o_custkey").alias("lk"), F.col("o_orderstatus").alias("ls")
    )
    got2 = index_lookup_join(
        left, o, [("lk", "o_custkey"), ("ls", "o_orderstatus")]
    )
    plan = got2._jdf.queryExecution().executedPlan().toString()
    assert "In(o_custkey" in plan
    assert "In(o_orderstatus" not in plan  # first key only, reference parity
    want = left.join(
        o, (left.lk == o.o_custkey) & (left.ls == o.o_orderstatus)
    )
    assert got2.count() == want.count()


def test_large_left_skips_probe_collect(spark, sides):
    """ADVICE r01: a left side clearly above max_push_keys must not pay
    a distinct shuffle + driver collect just to learn pushdown won't
    fire; the limit-probe answers that from ≤ cap+1 scanned rows."""
    cust, orders = sides
    out = index_lookup_join(cust, orders, ("c_custkey", "o_custkey"), max_push_keys=2)
    plain = cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "inner")
    assert _sorted_rows(out) == _sorted_rows(plain)


def test_push_hint_forced(spark, sides):
    cust, orders = sides
    forced = index_lookup_join(cust, orders, ("c_custkey", "o_custkey"), push=True)
    skipped = index_lookup_join(cust, orders, ("c_custkey", "o_custkey"), push=False)
    assert _sorted_rows(forced) == _sorted_rows(skipped)


def test_bloom_prefilter_join_exact_and_selective(spark, sf_dir):
    """Bloom pre-filter join: exact results (the join re-checks
    equality) and a genuinely selective pre-filter (most non-matching
    probe rows shed before the shuffle at the documented ~1% fpp)."""
    from geomesa_sql_spark.join.bloom import (
        bloom_filter_col,
        bloom_prefilter_join,
        build_bloom,
    )

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") % 20 == 0)
        .select("c_custkey", "c_name")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    got = bloom_prefilter_join(cust, orders, ("c_custkey", "o_custkey"))
    want = cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "inner")
    assert _sorted_rows(got.select("c_custkey", "o_orderkey")) == _sorted_rows(
        want.select("c_custkey", "o_orderkey")
    )

    bm = build_bloom(cust, "c_custkey", m_bits=1 << 20, k=7)
    kept = orders.filter(
        bloom_filter_col(bm, "o_custkey", m_bits=1 << 20, k=7)
    ).count()
    matching = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"], "left_semi"
    ).count()
    total = orders.count()
    # kept = matches + false positives; fp rate must be small
    assert matching <= kept
    assert (kept - matching) <= max(0.02 * (total - matching), 5)


def test_bloom_join_rejects_outer_modes(spark, sf_dir):
    from geomesa_sql_spark.join.bloom import bloom_prefilter_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with pytest.raises(ValueError, match="RIGHT/FULL"):
        bloom_prefilter_join(cust, orders, ("c_custkey", "o_custkey"), how="right")
    with pytest.raises(ValueError, match="RIGHT/FULL"):
        bloom_prefilter_join(cust, orders, ("c_custkey", "o_custkey"), how="full")


def test_many_rows_few_keys_still_pushes(spark, sf_dir):
    """Review r2: the pushdown gate must not conflate |rows| with
    |distinct keys| — a large left with few keys is exactly the
    workload the lookup join exists for."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    left = orders.select((F.col("o_custkey") % 3).alias("k3"))  # many rows, 3 keys
    got = index_lookup_join(left, orders, ("k3", "o_custkey"), max_push_keys=50)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(o_custkey" in plan, plan[:1200]


def test_left_residual_shared_column_name(spark, sf_dir):
    """Review r3: a right-side column sharing a left column's name
    broke the residual LEFT join's null-padding (name-based union) —
    positional union keeps it working."""
    from geomesa_sql_spark.join import index_lookup_join

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, name string"
    )
    right = spark.createDataFrame(
        [(1, "x", 5), (2, "y", 50)], "rk long, name string, v long"
    )
    out = index_lookup_join(
        left, right, ("k", "rk"), how="left", residual=F.col("v") < 10
    )
    rows = sorted(out.collect(), key=lambda r: r[0])
    assert len(rows) == 3
    assert rows[0][4] == 5          # k=1 matched, v=5 survives residual
    assert rows[1][4] is None       # k=2: residual disqualifies -> padded
    assert rows[2][4] is None       # k=3: no match -> padded
