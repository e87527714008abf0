#!/usr/bin/env python
"""geomesa-sqlline analog: an interactive SQL shell over the Engine.

The reference ships a sqlline-based CLI (``geomesa-sqlline -c catalog
[-p params] [-m model.yaml]``, README.md:16-140) whose surface is:
bang-commands (``!table``, ``!describe``, ``!quit``), SQL statements
terminated by ``;``, and per-query timing ("10 rows selected (0.095
seconds)"). This is that surface over the PySpark engine:

    python tools/sql_shell.py -d /root/testdata/sf0.001
    python tools/sql_shell.py -m model.yaml -e "SELECT ... ;"
    echo "!tables" | python tools/sql_shell.py -d <dir>

``-d DIR`` registers every ``<name>.parquet`` in DIR (the ``-c
catalog`` analog — table discovery from the store); ``-m`` loads a
Calcite-style model file (io/model.py); ``-e`` runs statements
non-interactively. Every SELECT goes through ``Engine.sql``, so the
SQL-text spatial planner (cell joins, bbox pushdown, EXISTS routing)
and the DML/MERGE surface are all live here, exactly as in the
programmatic API.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANG_HELP = """\
!tables / !table        list registered tables
!schemas                list Spark databases (model-file schemas)
!describe <table>       show a table's schema
!plan <sql>             show the physical plan without running
!maxrows <n>            cap displayed rows (default 100)
!help                   this text
!quit / !exit           leave the shell
"""


def _print_df(df, max_rows: int) -> None:
    t0 = time.time()
    rows = df.limit(max_rows + 1).collect()
    dt = time.time() - t0
    shown = rows[:max_rows]
    if shown:
        df.sparkSession.createDataFrame(shown, df.schema).show(
            max_rows, truncate=False
        )
    suffix = "+" if len(rows) > max_rows else ""
    n = len(shown)
    print(f"{n}{suffix} row{'s' if n != 1 else ''} selected ({dt:.3f} seconds)")


def run_statement(engine, stmt: str, max_rows: int = 100) -> None:
    df = engine.sql(stmt)
    _print_df(df, max_rows)


def _bang(engine, line: str, state: dict) -> bool:
    """Handle a !command; returns False when the shell should exit."""
    cmd, _, arg = line[1:].partition(" ")
    cmd, arg = cmd.strip().lower(), arg.strip()
    if cmd in ("quit", "exit", "q"):
        return False
    if cmd in ("table", "tables"):
        for t in engine.tables():
            print(t)
    elif cmd == "schemas":
        for db in engine.spark.catalog.listDatabases():
            print(db.name)
    elif cmd == "describe":
        try:
            schema = engine.describe(arg) if arg in engine.tables() \
                else engine.spark.table(arg).schema
        except Exception as exc:  # noqa: BLE001 — shell surface
            print(f"error: {exc}")
            return True
        for f in schema.fields:
            print(f"{f.name}\t{f.dataType.simpleString()}\t"
                  f"{'NULL' if f.nullable else 'NOT NULL'}")
    elif cmd == "plan":
        try:
            engine.sql(arg.rstrip(";")).explain("formatted")
        except Exception as exc:  # noqa: BLE001
            print(f"error: {exc}")
    elif cmd == "maxrows" and arg.isdigit():
        state["max_rows"] = int(arg)
    elif cmd == "help":
        print(BANG_HELP, end="")
    else:
        print(f"unknown command !{cmd} — try !help")
    return True


def repl(engine, stream, max_rows: int = 100, prompt: str | None = None) -> None:
    """Statement loop: bang-commands act on one line; SQL accumulates
    across lines until a terminating ``;`` (sqlline behavior)."""
    state = {"max_rows": max_rows}
    buf: list[str] = []
    while True:
        if prompt:
            print(prompt, end="", flush=True)
        line = stream.readline()
        if not line:
            break
        line = line.rstrip("\n")
        if not buf and line.strip().startswith("!"):
            if not _bang(engine, line.strip(), state):
                break
            continue
        if not line.strip() and not buf:
            continue
        buf.append(line)
        if line.rstrip().endswith(";"):
            stmt = "\n".join(buf).strip().rstrip(";")
            buf = []
            try:
                run_statement(engine, stmt, state["max_rows"])
            except Exception as exc:  # noqa: BLE001 — keep the shell alive
                print(f"error: {exc}")
    if buf:
        print("(unterminated statement discarded — end SQL with ';')")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-d", "--data", help="directory of <table>.parquet files")
    ap.add_argument("-m", "--model", help="Calcite-style model file (yaml/json)")
    ap.add_argument("-e", "--execute", action="append", default=[],
                    help="run statement(s) and exit (repeatable)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "4")))
    ap.add_argument("--fid", default="image_id", help="feature-id column name")
    ap.add_argument("--max-rows", type=int, default=100)
    args = ap.parse_args(argv)
    if not args.data and not args.model:
        ap.error("need -d DIR and/or -m MODEL")

    from geomesa_sql_spark import get_spark
    from geomesa_sql_spark.engine import Engine

    spark = get_spark("sql_shell", master=f"local[{args.cpus}]")
    if args.model:
        engine = Engine.from_model(spark, args.model, fid_col=args.fid)
    else:
        engine = Engine(spark, fid_col=args.fid)
    if args.data:
        from geomesa_sql_spark.io.model import _GEOJSONL_EXTS

        for fn in sorted(os.listdir(args.data)):
            stem, ext = os.path.splitext(fn)
            if ext == ".parquet":
                engine.register_table(stem, os.path.join(args.data, fn))
            elif ext in _GEOJSONL_EXTS:
                from geomesa_sql_spark.io.geojson import read_geojsonl

                engine.register_view(
                    stem, read_geojsonl(spark, os.path.join(args.data, fn))
                )

    if args.execute:
        for stmt in args.execute:
            run_statement(engine, stmt.rstrip().rstrip(";"), args.max_rows)
        return 0
    interactive = sys.stdin.isatty()
    if interactive:
        print("geomesa_sql_spark shell — !help for commands, !quit to exit")
    repl(engine, sys.stdin, args.max_rows,
         prompt="geomesa-sql> " if interactive else None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
