"""Kill-resume coverage for the r3 stateful operators (VERDICT r2 #8):
incremental-DBSCAN state and pyramid delta merges must survive a kill
between batches without losing or double-applying a delta."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403 — spark/sf_dir fixtures


def _blob(start_id, cx, cy, n=24):
    return [
        (start_id + k, cx + 0.05 * (k % 6), cy + 0.05 * (k // 6))
        for k in range(n)
    ]


def test_dbscan_incremental_kill_resume(spark, tmp_path):
    """Driver dies between delta batches: the committed state version
    resumes to byte-identical labels, an interrupted batch (computed
    but never committed) is re-applied exactly once, and the applied
    manifest never records a batch twice."""
    from geomesa_sql_spark.ops.cluster import (
        dbscan,
        dbscan_incremental,
        load_dbscan_state,
        save_dbscan_state,
    )

    schema = "id long, x double, y double"
    state_dir = str(tmp_path / "dbscan_state")
    base_rows = _blob(0, 0.0, 0.0) + _blob(100, 20.0, 0.0)
    batches = {
        "b1": _blob(200, 40.0, 0.0),
        "b2": [(300 + k, 0.3 + k * 0.7, 0.0) for k in range(29)],  # bridge
        "b3": _blob(400, -20.0, 5.0),
    }
    order = ["b1", "b2", "b3"]

    def run(kill_after=None, kill_before_save=None):
        """One 'process' lifetime: init-or-load, apply missing batches
        in order, persist after each; optionally die."""
        state, applied = load_dbscan_state(spark, state_dir)
        if state is None:
            _, state = dbscan(
                spark.createDataFrame(base_rows, schema),
                "id", "x", "y", eps=0.8, min_pts=3, coarse_cell=1.6,
                return_state=True,
            )
            save_dbscan_state(state, state_dir, applied)
        acc = list(base_rows) + [r for b in applied for r in batches[b]]
        for bid in order:
            if bid in applied:
                continue
            acc = acc + batches[bid]
            full = spark.createDataFrame(acc, schema)
            delta = spark.createDataFrame(batches[bid], schema)
            _, state = dbscan_incremental(
                full, delta, state, "id", "x", "y", eps=0.8, min_pts=3,
                coarse_cell=1.6,
            )
            if kill_before_save == bid:
                raise RuntimeError("killed before commit")
            applied = applied + [bid]
            save_dbscan_state(state, state_dir, applied)
            if kill_after == bid:
                raise RuntimeError("killed after commit")

    # lifetime 1: dies after committing b1
    with pytest.raises(RuntimeError):
        run(kill_after="b1")
    # lifetime 2: resumes (must SKIP b1), dies mid-b2 before commit
    with pytest.raises(RuntimeError):
        run(kill_before_save="b2")
    # lifetime 3: resumes from the still-b1 state, applies b2+b3
    run()

    state, applied = load_dbscan_state(spark, state_dir)
    assert applied == order  # each batch exactly once, in order
    all_rows = list(base_rows) + [r for b in order for r in batches[b]]
    want_df = dbscan(
        spark.createDataFrame(all_rows, schema),
        "id", "x", "y", eps=0.8, min_pts=3, coarse_cell=1.6,
    )
    got = {r.id: (r.cluster, r.role) for r in state["result"].collect()}
    want = {r.id: (r.cluster, r.role) for r in want_df.collect()}
    assert got == want
    # b2 bridged the two base blobs: one label across both
    labs = {got[i][0] for i in (0, 100) }
    assert labs == {0}


def test_merge_pyramids_kill_resume_no_double_merge(spark, sf_dir, tmp_path):
    """Pyramid maintenance over a sequence of deltas, checkpointed via
    the manifest runner: a kill between deltas resumes without
    re-merging a committed delta (the classic double-merge corruption
    for sum measures), and the final pyramid equals a from-scratch
    rebuild over base ∪ all deltas."""
    from geomesa_sql_spark.ckpt import CheckpointedRun
    from geomesa_sql_spark.io.fixtures import orders_points
    from geomesa_sql_spark.tiles import (
        assign_tiles,
        build_pyramid,
        merge_pyramids,
        tile_stats,
    )

    pts = orders_points(spark, sf_dir).select("o_orderkey", "lon", "lat")
    base = pts.filter("o_orderkey % 4 = 0")
    deltas = {
        f"d{m}": pts.filter(f"o_orderkey % 4 = {m}") for m in (1, 2, 3)
    }

    def pyramid_of(df):
        tiled = assign_tiles(df, zoom=6, x="lon", y="lat", with_hilbert=False)
        return build_pyramid(tile_stats(tiled), zoom=6, min_zoom=3)

    out_dir = str(tmp_path / "pyr")
    ck = CheckpointedRun(out_dir, plan_hash="pyr_v1", input_id="orders")

    # each unit = the AGGREGATED pyramid of one delta, written once
    # atomically; merging always reads the parts from disk, so a
    # resumed run cannot contribute a delta twice
    def unit(key):
        return pyramid_of(deltas[key])

    with pytest.raises(RuntimeError, match="simulated kill"):
        ck.run(sorted(deltas), unit, fail_after=1)
    done_first = ck.completed_keys()
    assert len(done_first) == 1

    res = ck.run(sorted(deltas), unit)  # resume
    assert {r.key for r in res if r.skipped} == done_first
    assert ck.completed_keys() == set(deltas)

    merged = pyramid_of(base)
    for key in sorted(deltas):
        part = spark.read.parquet(f"{out_dir}/part={key}")
        merged = merge_pyramids(merged, part)

    want = pyramid_of(pts)
    got_rows = sorted(map(tuple, merged.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
