"""Replicates the driver's correctness gate locally: run every
queries() entry via Spark and its oracle_sql() via DuckDB at a given
sf dir; compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def dtype_keys(df: pd.DataFrame) -> dict[str, str]:
    """Canonical per-column type kind, replicating the driver gate's
    TYPE-sensitivity (CLAUDE.md: the r01 hash mismatches were DuckDB
    HUGEINT/Decimal sums stringifying like ints — invisible to the
    value compare below, fatal to the driver's hash). Width is
    ignored (int32 vs int64 hash alike); kind is not."""
    out: dict[str, str] = {}
    for col in df.columns:
        dt = df[col].dtype
        if pd.api.types.is_bool_dtype(dt):
            kind = "bool"
        elif pd.api.types.is_integer_dtype(dt):
            kind = "int"
        elif pd.api.types.is_float_dtype(dt):
            kind = "float"
        elif pd.api.types.is_datetime64_any_dtype(dt):
            kind = "datetime"
        else:  # object: classify by the first non-null value
            s = df[col].dropna()
            kind = type(s.iloc[0]).__name__ if len(s) else "empty"
        out[col] = kind
    return out


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(f"{v:.9g}")
            elif isinstance(v, (bytes, bytearray)):
                row.append(v.hex())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from geomesa_sql_spark import get_spark

    spark = get_spark("check_oracle", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    unknown = sorted(only - set(qs))
    if unknown:
        print(f"ERROR: unknown query name(s) {unknown} — not in queries()")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR {type(ex).__name__}: {str(ex)[:200]}"))
            print(f"FAIL  {name}: spark error {str(ex)[:120]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} (rows-only, no oracle)")
            if len(got) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {str(ex)[:200]}"))
            print(f"FAIL  {name}: duckdb error {str(ex)[:120]}")
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rowcount {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"schema {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems:
            gk, wk = dtype_keys(got), dtype_keys(want)
            bad = {
                c: (gk[c], wk[c])
                for c in gk
                if gk[c] != wk[c]
                # ndarray vs list: both engines return array columns as
                # sequences; the driver hashes their elements alike
                and {gk[c], wk[c]} != {"ndarray", "list"}
                # a column that is all-NULL on both sides hashes alike
                # regardless of its declared type
                and "empty" not in (gk[c], wk[c])
            }
            if bad:
                problems.append(f"dtype kinds differ: {bad}")
        if not problems:
            ng, nw = normalize(got), normalize(want)
            if ng != nw:
                diff = [(a, b) for a, b in zip(ng, nw) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)[:300]}")
        else:
            print(f"ok    {name}: {len(got)} rows")
    print(f"\n{len(failures)} failures / {len(only) if only else len(qs)} queries")
    for name, msg in failures:
        print(f"  {name}: {msg[:200]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
