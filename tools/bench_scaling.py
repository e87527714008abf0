"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (BASELINE.json: ">=0.8 throughput scaling efficiency from N
to 4N executors").

No real cluster exists in this sandbox, so — per driver instruction —
the same job runs at two parallelism levels on the SAME input:
local[8] (N) and local[32] (4N). Each run goes through
``spark-submit --py-files <pkg.zip> bench.py`` (the deployment mode the
north rule names), parses the single JSON line bench.py prints, and the
result table lands in BENCH/BASELINE.md together with hot-cell skew
stats before/after salting.

Usage: python tools/bench_scaling.py [--quick]
  --quick: 100k-image headline table (CI-speed); default 600k.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_pyfiles_zip() -> str:
    zpath = "/tmp/spark_graft_bench/geomesa_sql_spark.zip"
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((REPO / "geomesa_sql_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
        z.write(REPO / "__spark_entry__.py", "__spark_entry__.py")
    return zpath


def run_bench(cpus: int, n_images: int, zpath: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_IMAGES=str(n_images),
    )
    spark_submit = shutil.which("spark-submit") or "spark-submit"
    cmd = [
        spark_submit,
        "--master", f"local[{cpus}]",
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        "--py-files", zpath,
        str(REPO / "bench.py"),
    ]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=3600, check=True
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from bench at cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def skew_stats(n_images: int) -> dict:
    """Rows per cell-partition key before/after salting, on the bench
    image table (10% of rows sit on the EXIF integer lattice → hot
    cells at coarse resolution)."""
    from pyspark.sql import functions as F

    from geomesa_sql_spark import get_spark
    from geomesa_sql_spark.io.layout import add_cell

    spark = get_spark("skew", master="local[8]")
    from bench import _bench_images_path

    img = spark.read.parquet(_bench_images_path(spark, n_images, size=8))
    cells = add_cell(img.select("image_id", "lon", "lat"), res=4)
    per_cell = cells.groupBy("cell").count()
    rows = per_cell.select("count").toPandas()["count"]
    before = {"max": int(rows.max()), "median": float(rows.median()), "n_keys": len(rows)}

    salt = 8
    hot_threshold = float(rows.median()) * 4
    salted = cells.withColumn(
        "salt",
        F.when(
            F.col("cell").isin(
                [int(r) for r in per_cell.filter(F.col("count") > hot_threshold)
                 .toPandas()["cell"]]
            ),
            F.pmod(F.xxhash64("image_id"), F.lit(salt)),
        ).otherwise(F.lit(0)),
    )
    rows_a = salted.groupBy("cell", "salt").count().select("count").toPandas()["count"]
    after = {"max": int(rows_a.max()), "median": float(rows_a.median()), "n_keys": len(rows_a)}
    spark.stop()
    return {"before": before, "after": after, "salt": salt,
            "hot_threshold_rows": int(hot_threshold)}


def main() -> int:
    n_images = 100_000 if "--quick" in sys.argv else 600_000
    zpath = build_pyfiles_zip()

    r8 = run_bench(8, n_images, zpath)
    r32 = run_bench(32, n_images, zpath)
    tput8 = r8["headline_rows_per_sec"]
    tput32 = r32["headline_rows_per_sec"]
    eff = (tput32 / tput8) / 4.0
    skew = skew_stats(n_images)

    os.makedirs(REPO / "BENCH", exist_ok=True)
    md = REPO / "BENCH" / "BASELINE.md"
    lines = [
        "# BENCH — measured baseline + scaling efficiency",
        "",
        "Job: cell encode → spatial hash join (image points × 25 polygons,",
        "broadcast) → PIP refine → Z-order tile assignment (zoom 8) → rollup.",
        f"Input: {n_images:,} synthetic image+caption rows (input_hint schema),",
        "identical parquet input for both runs; median of 3 warmed runs each;",
        "run via `spark-submit --py-files` (tools/bench_scaling.py).",
        "",
        "| parallelism | headline sec | rows/sec |",
        "|---|---|---|",
        f"| local[8] (N) | {r8['value']} | {tput8:,.0f} |",
        f"| local[32] (4N) | {r32['value']} | {tput32:,.0f} |",
        "",
        f"**Scaling efficiency (N→4N) = ({tput32:,.0f} / {tput8:,.0f}) / 4 = "
        f"{eff:.3f}** (target ≥ 0.8)",
        "",
        "## Hot-cell skew, before/after salting (res-4 cells, salt=8)",
        "",
        "| | max rows/key | median rows/key | #keys |",
        "|---|---|---|---|",
        f"| before | {skew['before']['max']:,} | {skew['before']['median']:,.0f} | {skew['before']['n_keys']} |",
        f"| after | {skew['after']['max']:,} | {skew['after']['median']:,.0f} | {skew['after']['n_keys']} |",
        "",
        f"Hot threshold: > {skew['hot_threshold_rows']:,} rows/cell (4× median).",
        "",
        "## Per-query latency (sec, local[32], sf0.1 driver tables)",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for k in sorted(r32["queries"]):
        lines.append(f"| {k} | {r8['queries'].get(k, '—')} | {r32['queries'][k]} |")
    lines += [
        "",
        "```json",
        json.dumps({"local8": r8, "local32": r32, "scaling_efficiency": round(eff, 3),
                    "skew": skew}),
        "```",
        "",
    ]
    md.write_text("\n".join(lines))
    print(json.dumps({"scaling_efficiency": round(eff, 3), "tput8": tput8,
                      "tput32": tput32, "out": str(md)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
