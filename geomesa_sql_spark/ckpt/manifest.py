"""Resumable batch: per-partition checkpoint manifest with lineage.

North-rule requirement (BASELINE.json:14): "resumable from checkpoint
with per-partition lineage + metrics" — a killed job resumes without
recomputing completed cells. The reference has no streaming/checkpoint
machinery (SURVEY.md §2.8: batch pull only); this is our own design:

- work is split by a deterministic partition key (coarse cell id, tile
  id, or any hash bucket) — the same key set on every run because all
  engine hashing is seed-fixed;
- each completed unit appends one JSON line to ``manifest.jsonl``:
  {key, rows, plan_hash, input, wall_sec} — lineage is (input snapshot
  path + plan hash), metrics are row counts + wall time;
- output for unit K lands under ``out_dir/part=K/`` atomically
  (write to ``_tmp`` then rename), so a crash mid-unit leaves no
  manifest line and a retry overwrites the partial;
- resume = read manifest, skip keys whose (plan_hash, input) match.

The driver-side loop over units is control flow only; each unit runs
as a full distributed Spark job over that key's slice.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Callable, Iterable

from pyspark.sql import DataFrame


@dataclass
class UnitResult:
    key: str
    rows: int
    wall_sec: float
    skipped: bool


class CheckpointedRun:
    def __init__(self, out_dir: str, plan_hash: str, input_id: str):
        self.out_dir = out_dir
        self.plan_hash = plan_hash
        self.input_id = input_id
        self.manifest_path = os.path.join(out_dir, "manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed_keys(self) -> set[str]:
        done = set()
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["plan_hash"] == self.plan_hash and rec["input"] == self.input_id:
                        done.add(rec["key"])
        return done

    def run(
        self,
        keys: Iterable[str],
        unit: Callable[[str], DataFrame],
        fail_after: int | None = None,
    ) -> list[UnitResult]:
        """Process ``unit(key)`` for each key not already completed.

        ``fail_after``: testing hook — raise after N fresh units to
        simulate a kill; the next ``run`` resumes from the manifest.
        """
        done = self.completed_keys()
        results: list[UnitResult] = []
        fresh = 0
        for key in keys:
            if key in done:
                results.append(UnitResult(key, -1, 0.0, skipped=True))
                continue
            if fail_after is not None and fresh >= fail_after:
                raise RuntimeError(f"simulated kill after {fresh} units")
            t0 = time.time()
            part_dir = os.path.join(self.out_dir, f"part={key}")
            tmp_dir = part_dir + "._tmp"
            df = unit(key)
            df.write.mode("overwrite").parquet(tmp_dir)
            rows = df.sparkSession.read.parquet(tmp_dir).count()
            if os.path.exists(part_dir):
                shutil.rmtree(part_dir)
            os.rename(tmp_dir, part_dir)
            wall = time.time() - t0
            with open(self.manifest_path, "a") as f:
                f.write(
                    json.dumps(
                        {
                            "key": key,
                            "rows": rows,
                            "plan_hash": self.plan_hash,
                            "input": self.input_id,
                            "wall_sec": round(wall, 3),
                            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                        }
                    )
                    + "\n"
                )
            results.append(UnitResult(key, rows, wall, skipped=False))
            fresh += 1
        return results

    def metrics(self) -> dict:
        recs = []
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                recs = [json.loads(line) for line in f]
        return {
            "units": len(recs),
            "rows": sum(r["rows"] for r in recs),
            "wall_sec": round(sum(r["wall_sec"] for r in recs), 3),
        }
