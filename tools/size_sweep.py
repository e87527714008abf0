"""Data-size linearity evidence: the same pipeline at 0.5M / 1M / 2M
input rows at a fixed parallelism — rows/sec should hold (a flat line)
if the plan has no super-linear stage. Complements the N-vs-4N core
scaling in BENCH/BASELINE.md: that shows compute scale-OUT, this shows
scale-UP with data volume, which is what 100 TB actually stresses.

Writes BENCH/SIZESWEEP.md. Usage: python tools/size_sweep.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from bench_scaling import build_pyfiles_zip, spark_submit  # noqa: E402


def main() -> int:
    quick = "--quick" in sys.argv
    sizes = [250_000, 500_000, 1_000_000] if quick else [500_000, 1_000_000, 2_000_000]
    cpus = int(os.environ.get("SPARK_GRAFT_SWEEP_CPUS", "16"))
    rounds = int(os.environ.get("SPARK_GRAFT_SWEEP_ROUNDS", "2"))
    zpath = build_pyfiles_zip()

    best: dict[int, dict] = {}
    for _ in range(rounds):  # interleave sizes; per-size minima (host drift)
        for n in sizes:
            r = spark_submit(
                str(REPO / "tools/scale_job.py"), cpus, zpath,
                {"SPARK_GRAFT_SCALE_IMAGES": str(n)},
            )
            if n not in best or r["sec"] < best[n]["sec"]:
                best[n] = r

    base_tput = best[sizes[0]]["rows_per_sec"]
    lines = [
        "# Data-size linearity (fixed local[%d], tools/scale_job.py pipeline)" % cpus,
        "",
        "Same job (decode → featurize → cell encode → broadcast spatial",
        "join → PIP refine → Hilbert tiles → rollup) at growing input",
        "sizes; interleaved rounds, per-size minima. rows/sec holding (or",
        "improving, as per-job fixed costs amortize) means no stage is",
        "super-linear in the input — the",
        "property that lets the plan extrapolate to 100 TB (the N→4N",
        "core-scaling evidence is in BENCH/BASELINE.md).",
        "",
        "| input rows | sec | rows/sec | vs smallest |",
        "|---|---|---|---|",
    ]
    for n in sizes:
        r = best[n]
        lines.append(
            f"| {n:,} | {r['sec']} | {r['rows_per_sec']:,.0f} | "
            f"{r['rows_per_sec'] / base_tput:.2f}× |"
        )
    lines += ["", "```json", json.dumps({str(n): best[n] for n in sizes}), "```", ""]
    out = REPO / "BENCH" / "SIZESWEEP.md"
    out.write_text("\n".join(lines))
    ratio = best[sizes[-1]]["rows_per_sec"] / base_tput
    print(json.dumps({"sizes": sizes, "tput_ratio_largest_vs_smallest": round(ratio, 3),
                      "out": str(out)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
