"""Streaming density-cluster maintenance: DBSCAN labels kept current
as points arrive.

Spark-first composition, not a new algorithm: Structured Streaming's
``foreachBatch`` hands each micro-batch to the batch engine's
:func:`ops.cluster.dbscan_incremental`, which reclusters only the
coarse cells the batch can affect and re-merges labels globally —
the micro-batch IS the append delta. State is the operator's own
maintenance dict {local, eq, resolved, result} (driver-held
DataFrames, lineage truncated by ``localCheckpoint`` each step; use
``ops.cluster.save_dbscan_state`` for durable kill-resume), and the
accumulated point table grows by each batch. Each batch also exposes
``delta`` — the upsert rows a label sink MERGEs on the key to track
the full labels writing O(delta) rows per batch.

Batches are append-only point rows by default; with ``op`` set the
maintainer speaks a CHANGELOG (CDC) contract instead — 'D' events
delete their key, other events upsert — built on the batch operator's
general-delta form (removals and moves recluster only the dirty
cells, like appends). Removed keys surface per batch as ``deleted`` /
``on_deleted`` so a MERGE sink can delete them.

This mirrors how the engine's other incremental structure (the tile
pyramid) is maintained: batch operator + delta-merge law, driven by
the stream — rather than a bespoke stateful operator whose
correctness would be unprovable against the batch twin. The
maintained labels equal a from-scratch ``dbscan`` over everything
seen so far after every batch (asserted in tests).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from geomesa_sql_spark.ops.cluster import dbscan, dbscan_incremental


class DbscanMaintainer:
    """foreachBatch callback object maintaining DBSCAN labels.

    After each batch, ``labels`` holds (id, cluster, role) for every
    point seen so far; ``on_update`` (if given) receives it (e.g. to
    write a sink table).

    ``op`` (optional) switches the maintainer to a CHANGELOG (CDC)
    contract: each batch row carries that column, where the value
    ``'D'`` deletes the row's key and anything else ('I', 'U', ...)
    upserts the row's coordinates for its key. Old coordinates for
    deleted/moved keys are looked up from the accumulated state BY
    KEY, so delete events need only the key (their x/y may be NULL).
    Events are SET-reduced per key within a batch (not replayed in
    order — there is no ordering column): any non-'D' event with
    complete coordinates upserts the key (deterministically the
    lexicographic max (x, y) among them), and a key deletes when all
    its events are 'D' or NULL-coordinate (a position-less upsert
    cannot cluster, so it deletes rather than silently dropping the
    key from labels while the MERGE sink keeps the stale row).
    Compacted changelogs (one event per key per micro-batch) are
    unaffected. Without ``op``, batches are append-only point rows,
    as before."""

    def __init__(
        self,
        key: str,
        x: str,
        y: str,
        eps: float,
        min_pts: int,
        coarse_cell: float | None = None,
        on_update: Callable[[DataFrame], None] | None = None,
        on_delta: Callable[[DataFrame], None] | None = None,
        metric: str = "planar",
        op: str | None = None,
        on_deleted: Callable[[DataFrame], None] | None = None,
    ):
        self._args = (key, x, y)
        self._kw = dict(
            eps=eps, min_pts=min_pts, coarse_cell=coarse_cell, metric=metric
        )
        self._op = op
        self._on_update = on_update
        self._on_delta = on_delta
        self._on_deleted = on_deleted
        self._seen: DataFrame | None = None
        self._state: DataFrame | None = None
        self.labels: DataFrame | None = None
        self._last_batch_id: int | None = None
        #: per-batch upsert rows (r3): MERGE these on the key into a
        #: label sink to track ``labels`` writing O(delta), not
        #: O(state), rows per batch — PLUS, in changelog mode, delete
        #: the keys in ``deleted`` (upserts cannot express removal);
        #: ``on_deleted`` receives that frame per batch
        self.delta: DataFrame | None = None
        #: changelog mode only: keys removed by the last batch (they
        #: existed before and the batch carried a 'D' event for them)
        self.deleted: DataFrame | None = None

    def _apply_changelog(self, batch: DataFrame):
        """(new seen, delta rows for dbscan_incremental, deleted keys).
        Uniform upsert-or-delete semantics keyed by id, reduced to ONE
        event per key first (set semantics even for an uncompacted
        batch: any non-'D' event upserts the key — deterministically
        the lexicographic max (x, y) among them — and a key deletes
        only when ALL its events are 'D'; without the reduction,
        duplicate upsert rows would BOTH enter ``_seen`` and inflate
        eps-neighborhood counts for the rest of the stream). Every
        event key's old row (from ``_seen``) joins the delta, and
        ``_seen`` swaps old for new."""
        from pyspark.sql import functions as F

        key, x, y = self._args
        # a NULL op is an upsert (only the literal 'D' deletes) — a
        # bare != would return NULL and silently DROP the row from
        # the upsert side while its key is anti-joined out of seen.
        # An upsert with a NULL coordinate counts as a DELETE of the
        # key: the clustering drops NULL-coord rows anyway, so
        # admitting it would remove the key from labels while
        # reporting it in neither delta nor deleted — a MERGE sink
        # would keep the stale label forever (r5 review).
        is_delete = F.col(self._op).eqNullSafe(F.lit("D"))
        per_key = batch.groupBy(key).agg(
            F.max(
                F.when(
                    ~is_delete
                    & F.col(x).isNotNull()
                    & F.col(y).isNotNull(),
                    F.struct(F.col(x).alias("x"), F.col(y).alias("y")),
                )
            ).alias("__new")
        )
        new_rows = per_key.filter(F.col("__new").isNotNull()).select(
            key,
            F.col("__new.x").alias(x),
            F.col("__new.y").alias(y),
        )
        if self._seen is None:
            return new_rows, new_rows, new_rows.select(key).limit(0)
        keys = per_key.select(key)
        old_rows = self._seen.join(keys, key, "left_semi")
        seen = (
            self._seen.join(keys, key, "left_anti").unionByName(new_rows)
        )
        deleted = (
            per_key.filter(F.col("__new").isNull())
            .select(key)
            .join(self._seen, key, "left_semi")
        )
        return seen, old_rows.unionByName(new_rows), deleted

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        # foreachBatch replays a batch when a sink throws or the query
        # restarts before the epoch commits; unioning the SAME batch
        # into _seen twice would duplicate points and inflate
        # eps-neighborhood counts (fake cores) for the rest of the
        # stream (review r4o). Replays re-run the SINKS only, against
        # the state already computed for this batch.
        key, x, y = self._args
        cols = [key, x, y]
        if batch_id != self._last_batch_id:
            deleted = None
            if self._op is not None:
                batch = batch.select(*cols, self._op).localCheckpoint(
                    eager=True
                )
                seen, delta, deleted = self._apply_changelog(batch)
                seen = seen.localCheckpoint(eager=True)
                # materialize ``deleted`` BEFORE any state mutation:
                # its plan semi-joins the PRE-batch _seen, and a
                # replay after a later failure would recompute it
                # against the already-updated _seen (empty — the
                # on_deleted sink would permanently miss the batch)
                deleted = deleted.localCheckpoint(eager=True)
                if self._seen is None:
                    labels, state = dbscan(
                        seen, key, x, y, return_state=True, **self._kw
                    )
                else:
                    labels, state = dbscan_incremental(
                        seen, delta, self._state, key, x, y, **self._kw
                    )
            elif self._seen is None:
                seen = batch.select(*cols).localCheckpoint(eager=True)
                labels, state = dbscan(
                    seen, key, x, y, return_state=True, **self._kw
                )
            else:
                batch = batch.select(*cols).localCheckpoint(eager=True)
                seen = self._seen.unionByName(batch).localCheckpoint(
                    eager=True
                )
                labels, state = dbscan_incremental(
                    seen, batch, self._state, key, x, y, **self._kw
                )
            # mutate state only after the incremental step succeeded,
            # so a failure above leaves a replayable maintainer
            self._seen, self.labels, self._state = seen, labels, state
            self.delta = self._state.get("delta")
            self.deleted = deleted
            self._last_batch_id = batch_id
        if self._on_update is not None:
            self._on_update(self.labels)
        if self._on_delta is not None and self.delta is not None:
            self._on_delta(self.delta)
        if self._on_deleted is not None and self.deleted is not None:
            self._on_deleted(self.deleted)


def streaming_dbscan(
    stream_points: DataFrame,
    key: str,
    x: str,
    y: str,
    eps: float,
    min_pts: int,
    coarse_cell: float | None = None,
    on_update: Callable[[DataFrame], None] | None = None,
    on_delta: Callable[[DataFrame], None] | None = None,
    metric: str = "planar",
    op: str | None = None,
    on_deleted: Callable[[DataFrame], None] | None = None,
) -> tuple["DbscanMaintainer", "DataFrame"]:
    """Wire a streaming point source into incremental DBSCAN
    maintenance. Returns (maintainer, writer-ready stream): start it
    with ``maintainer, q = streaming_dbscan(...);
    q.writeStream.foreachBatch(maintainer)...start()`` — split so the
    caller owns trigger/output options. ``on_delta`` receives the
    per-batch upsert rows (the O(delta) production sink path).
    ``metric='sphere'`` maintains geodesic clusters (x/y = lon/lat
    degrees, eps in metres). ``op`` names a changelog column ('D'
    deletes the key, anything else upserts — see
    :class:`DbscanMaintainer`); ``on_deleted`` then receives each
    batch's removed keys (a MERGE sink deletes them — upsert rows
    alone cannot express removal)."""
    return (
        DbscanMaintainer(
            key, x, y, eps, min_pts, coarse_cell, on_update, on_delta,
            metric=metric, op=op, on_deleted=on_deleted,
        ),
        stream_points,
    )
