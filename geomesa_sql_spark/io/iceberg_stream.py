"""Iceberg as a registered Spark Python Data Source + metadata tables.

Three surfaces over the pure-Python Iceberg layer (io/iceberg_meta.py):

1. ``GeomesaIcebergDataSource`` — a real PySpark 4 Data Source
   (``spark.dataSource.register``), so Iceberg table dirs read through
   the NATIVE entry points:
   - batch: ``spark.read.format("geomesa_iceberg").load(path)`` with
     **manifest-level filter pushdown** — Spark pushes =, <, <=, >, >=
     and IN filters into ``pushFilters``; they become column-bounds
     pruning in ``plan_files`` so non-matching data files are skipped
     before any partition is planned (the O(files-matched) lever at
     100 TB). Pruning is conservative, so every pushed filter is also
     returned to Spark for residual re-evaluation — correctness never
     depends on file stats.
   - streaming: ``spark.readStream.format("geomesa_iceberg")`` is an
     incremental APPEND scan: offsets are Iceberg sequence numbers,
     each micro-batch reads exactly the data files added by snapshots
     in (start, end] — planned from only the manifests those snapshots
     ADDED (entry provenance), so per-batch metadata cost is O(files
     added), with a full path-diff fallback for foreign writers — one
     InputPartition per file, executor-side pyarrow reads yielding
     Arrow batches (no row-at-a-time Python). Non-append snapshots
     (delete/overwrite/replace) in the range raise, matching Iceberg's
     own streaming reader contract.

2. Field-id column resolution in every partition read: parquet files
   written before a rename land in the renamed column; dropped-then-
   readded names get NULLs, never resurrected data.

3. Metadata tables — ``snapshots_df`` / ``files_df`` / ``history_df``
   / ``manifests_df``: the standard Iceberg inspection surface
   (reference §2.10 metadata-ops analog for the table format).

MoR limitation (documented, loud): a snapshot carrying delete files
cannot be served through the partition-per-file model (applying
position/equality deletes needs a distributed anti-join); the batch
path raises and points at ``iceberg_meta.IcebergTable.read`` which
handles merge-on-read distributed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from geomesa_sql_spark.io.iceberg_meta import IcebergTable

_NAME = "geomesa_iceberg"


# ------------------------------------------------------------ partition read


def _read_file_by_field_id(path: str, fields: list[dict]):
    """One parquet data file → pyarrow batches in the CURRENT schema:
    columns matched by Iceberg field-id when the file carries
    ``PARQUET:field_id`` metadata (name-based fallback otherwise),
    renamed to current names, missing columns filled with NULLs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    schema = f.schema_arrow
    by_id = {}
    for i, fld in enumerate(schema):
        meta = fld.metadata or {}
        fid = meta.get(b"PARQUET:field_id")
        if fid is not None:
            by_id[int(fid)] = fld.name
    want_cols = []
    out_names = []
    missing = []
    for fld in fields:
        src = by_id.get(fld["id"]) if by_id else (
            fld["name"] if fld["name"] in schema.names else None
        )
        if src is None:
            missing.append(fld["name"])
        else:
            want_cols.append(src)
            out_names.append(fld["name"])
    for batch in f.iter_batches(columns=want_cols, batch_size=8192):
        arrays = {n: batch.column(i) for i, n in enumerate(out_names)}
        cols = []
        for fld in fields:
            if fld["name"] in arrays:
                cols.append(arrays[fld["name"]])
            else:
                cols.append(pa.nulls(batch.num_rows))
        yield pa.RecordBatch.from_arrays(cols, [fld["name"] for fld in fields])


class _FilePartition(InputPartition):
    def __init__(self, path: str, fields: list[dict]):
        self.path = path
        self.fields = fields


# ------------------------------------------------------------------- batch


_NUMERIC_ICE = {"int", "long", "float", "double"}


def _bounds_from_filters(filters, fields: list[dict]):
    """Supported comparison filters -> (plan_files ``bounds``, empty).

    Semantics (review r4l -- the naive max(lo)/min(hi) fold inverted
    mixed IN+range filters into a range that PRUNED matching files):
    per column, point sets (=, IN) and range bounds (>, >=, <, <=) are
    ANDed properly -- points get clipped by the range; an empty
    intersection returns ``empty=True`` (zero partitions), never an
    inverted range. Only NUMERIC columns with numeric literals
    participate: file bounds decode to the column's type, so the
    +/-inf sentinels and cross-type comparisons would raise on
    str/date columns -- those filters are simply not pushed (Spark
    re-evaluates every filter anyway; pruning here is a pure fast
    path)."""
    types = {f["name"]: f["type"] for f in fields}
    pts: dict[str, set] = {}
    los: dict[str, object] = {}
    his: dict[str, object] = {}

    def _num(v):
        return isinstance(v, (int, float)) and not isinstance(v, bool)

    for flt in filters:
        try:
            col = flt.attribute[0] if len(flt.attribute) == 1 else None
        except Exception:
            col = None
        if col is None or types.get(col) not in _NUMERIC_ICE:
            continue
        if isinstance(flt, EqualTo) and _num(flt.value):
            # EqualTo is a one-element In: ANDed equalities INTERSECT
            # (x=1 AND x=2 is provably empty) — unioning them kept
            # files containing either value (advice r4)
            s = {flt.value}
            pts[col] = pts[col] & s if col in pts else s
        elif isinstance(flt, In) and all(_num(v) for v in flt.value):
            s = set(flt.value)
            # ANDed IN lists intersect
            pts[col] = pts[col] & s if col in pts else s
        elif isinstance(flt, (GreaterThan, GreaterThanOrEqual)) and _num(flt.value):
            los[col] = max(los.get(col, flt.value), flt.value)
        elif isinstance(flt, (LessThan, LessThanOrEqual)) and _num(flt.value):
            his[col] = min(his.get(col, flt.value), flt.value)

    out: dict[str, object] = {}
    for col in set(pts) | set(los) | set(his):
        lo = los.get(col, float("-inf"))
        hi = his.get(col, float("inf"))
        if col in pts:
            alive = sorted(v for v in pts[col] if lo <= v <= hi)
            if not alive:
                return {}, True
            out[col] = [(v, v) for v in alive]
        else:
            if lo > hi:
                return {}, True
            out[col] = (lo, hi)
    return out, False


class IcebergBatchReader(DataSourceReader):
    def __init__(self, path: str, options):
        self.table = IcebergTable.load(path)
        self.snapshot_id = options.get("snapshot_id")
        if self.snapshot_id is not None:
            self.snapshot_id = int(self.snapshot_id)
        self._bounds = None
        self._empty = False
        self.fields = self.table.schema_fields()

    def pushFilters(self, filters):
        self._bounds, self._empty = _bounds_from_filters(filters, self.fields)
        self._bounds = self._bounds or None
        # conservative stats pruning: every filter still re-applied by
        # Spark, so yield them all back as unhandled
        yield from filters

    def partitions(self):
        if self._empty:
            # provably-empty filter intersection (e.g. x IN (1) AND
            # x > 5): one no-op partition, no metadata decode
            return [_FilePartition(None, self.fields)]
        data, deletes, _ = self.table.plan_files(
            snapshot_id=self.snapshot_id, bounds=self._bounds
        )
        if deletes:
            raise ValueError(
                "geomesa_iceberg batch source: snapshot has merge-on-read "
                "delete files; read via iceberg_meta.IcebergTable.read "
                "(distributed MoR) or compact() first"
            )
        if not data:
            return [_FilePartition(None, self.fields)]
        return [_FilePartition(d["path"], self.fields) for d in data]

    def read(self, partition: _FilePartition):
        if partition.path is None:
            return
        yield from _read_file_by_field_id(partition.path, partition.fields)


# ---------------------------------------------------------------- streaming


def _ordered_snapshots(t: IcebergTable) -> list[dict]:
    return sorted(
        t.snapshots(),
        key=lambda s: (s.get("sequence-number", 0), s["timestamp-ms"]),
    )


def _files_at(t: IcebergTable, snapshot_id) -> set[str]:
    data, _, _ = t.plan_files(snapshot_id=snapshot_id)
    return {d["path"] for d in data}


def _added_files(t: IcebergTable, snap: dict) -> list[str] | None:
    """Data files ADDED by one snapshot, reading only the manifests
    that snapshot added (entry status==1 + matching snapshot ids) —
    per-batch cost O(files added), not O(files stored) (review r4l:
    the path-diff fallback decodes every manifest of two full
    snapshots). Returns None when provenance fields are missing
    (foreign writers) so the caller can fall back to the path diff."""
    from geomesa_sql_spark.io.avro import read_avro
    from geomesa_sql_spark.io.iceberg_meta import _manifest_entries, _read

    sid = snap["snapshot-id"]
    _, manifests, _ = read_avro(_read(snap["manifest-list"]))
    added: list[str] = []
    saw_provenance = False
    for m in manifests:
        if m.get("added_snapshot_id") is None:
            return None
        if m["added_snapshot_id"] != sid:
            continue
        saw_provenance = True
        for e in _manifest_entries(m["manifest_path"]):
            if e["status"] != 1 or e["data_file"].get("content", 0) != 0:
                continue
            esid = e.get("snapshot_id")
            if esid in (None, sid):
                added.append(e["data_file"]["file_path"])
    if not saw_provenance and manifests:
        # an append snapshot that added no new manifest is legal only
        # for empty appends; treat as no files
        summary = snap.get("summary") or {}
        if summary.get("added-data-files") not in (None, "0", 0):
            return None
    return added


class IcebergStreamReader(DataSourceStreamReader):
    """Incremental append scan. Offset = {"seq": last consumed
    sequence number} (0 = nothing consumed). ``starting_seq`` option
    sets the initial offset (default 0 → from the beginning);
    ``starting_snapshot_id`` resolves a snapshot's seq instead."""

    def __init__(self, path: str, options):
        self.path = path
        t = IcebergTable.load(path)
        start = int(options.get("starting_seq", 0))
        sid = options.get("starting_snapshot_id")
        if sid is not None:
            snap = t.snapshot(snapshot_id=int(sid))
            start = snap.get("sequence-number", 0)
        self._start = start
        self.fields = t.schema_fields()

    def initialOffset(self) -> dict:
        return {"seq": self._start}

    def latestOffset(self) -> dict:
        t = IcebergTable.load(self.path)
        snaps = _ordered_snapshots(t)
        if not snaps:
            return {"seq": self._start}
        return {"seq": max(self._start, snaps[-1].get("sequence-number", 0))}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["seq"], end["seq"]
        if hi <= lo:
            return []
        t = IcebergTable.load(self.path)
        ordered = _ordered_snapshots(t)
        snaps = [s for s in ordered if lo < s.get("sequence-number", 0) <= hi]
        for s in snaps:
            op = (s.get("summary") or {}).get("operation", "append")
            if op not in ("append",):
                raise ValueError(
                    f"geomesa_iceberg stream: snapshot {s['snapshot-id']} is "
                    f"'{op}' — the incremental scan reads appends only "
                    "(start after it with starting_snapshot_id, or rebuild "
                    "the downstream state from a batch read)"
                )
        if not snaps:
            return []
        # fast path: read only the manifests each snapshot ADDED —
        # per-batch metadata cost scales with files added, not stored
        added: list[str] = []
        for s in snaps:
            a = _added_files(t, s)
            if a is None:
                # foreign writer without provenance fields: fall back
                # to the path-diff of the two snapshot plans
                after = _files_at(t, snaps[-1]["snapshot-id"])
                before_snaps = [
                    s2
                    for s2 in ordered
                    if s2.get("sequence-number", 0) <= lo
                ]
                before = (
                    _files_at(t, before_snaps[-1]["snapshot-id"])
                    if before_snaps
                    else set()
                )
                added = sorted(after - before)
                break
            added.extend(a)
        else:
            added = sorted(set(added))
        return [_FilePartition(p, self.fields) for p in added]

    def read(self, partition: _FilePartition):
        yield from _read_file_by_field_id(partition.path, partition.fields)

    def commit(self, end: dict) -> None:
        pass


# -------------------------------------------------------------- data source


class GeomesaIcebergDataSource(DataSource):
    """register with ``register_iceberg_source(spark)``; then
    ``spark.read.format("geomesa_iceberg").load(path)`` and
    ``spark.readStream.format("geomesa_iceberg").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return _NAME

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("geomesa_iceberg: .load(<table dir>) required")
        return p

    def schema(self):
        # runs in a worker with no SparkSession: emit a DDL string
        # (StructType parsing would need an active context)
        from geomesa_sql_spark.io.iceberg_meta import _ICE_TO_SPARK

        t = IcebergTable.load(self._path())
        return ", ".join(
            f"{f['name']} {_ICE_TO_SPARK.get(f['type'], 'binary')}"
            for f in t.schema_fields()
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return IcebergBatchReader(self._path(), self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return IcebergStreamReader(self._path(), self.options)


def register_iceberg_source(spark: SparkSession) -> None:
    # pushFilters requires the (off-by-default) python pushdown flag;
    # without it Spark refuses to plan a reader that implements it
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GeomesaIcebergDataSource)


# ----------------------------------------------------------- metadata tables


def snapshots_df(spark: SparkSession, path: str) -> DataFrame:
    """The standard ``snapshots`` inspection table."""
    t = IcebergTable.load(path)
    rows = [
        (
            int(s["snapshot-id"]),
            s.get("parent-snapshot-id"),
            int(s.get("sequence-number", 0)),
            int(s["timestamp-ms"]),
            (s.get("summary") or {}).get("operation"),
            json.dumps(s.get("summary") or {}, sort_keys=True),
            s.get("manifest-list"),
        )
        for s in _ordered_snapshots(t)
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id long, parent_id long, sequence_number long, "
        "committed_at_ms long, operation string, summary string, "
        "manifest_list string",
    )


def history_df(spark: SparkSession, path: str) -> DataFrame:
    """Snapshot lineage with current-ancestor marking (the ``history``
    table): walk parent pointers back from the current snapshot."""
    t = IcebergTable.load(path)
    cur = t.metadata.get("current-snapshot-id")
    by_id = {s["snapshot-id"]: s for s in t.snapshots()}
    ancestors = set()
    while cur in by_id:
        ancestors.add(cur)
        cur = by_id[cur].get("parent-snapshot-id")
    rows = [
        (int(s["timestamp-ms"]), int(s["snapshot-id"]),
         s.get("parent-snapshot-id"), s["snapshot-id"] in ancestors)
        for s in _ordered_snapshots(t)
    ]
    return spark.createDataFrame(
        rows,
        "made_current_at_ms long, snapshot_id long, parent_id long, "
        "is_current_ancestor boolean",
    )


def files_df(spark: SparkSession, path: str, snapshot_id=None) -> DataFrame:
    """The ``files`` inspection table for one snapshot (default
    current): every live data/delete file with its stats."""
    t = IcebergTable.load(path)
    data, deletes, _ = t.plan_files(snapshot_id=snapshot_id)
    rows = [
        (
            d["path"],
            int(d["content"]),
            int(d["record_count"]),
            int(d["seq"]),
            os.path.getsize(d["path"]) if os.path.exists(d["path"]) else None,
        )
        for d in data + deletes
    ]
    return spark.createDataFrame(
        rows,
        "file_path string, content int, record_count long, "
        "sequence_number long, file_size_bytes long",
    )


def manifests_df(spark: SparkSession, path: str, snapshot_id=None) -> DataFrame:
    from geomesa_sql_spark.io.avro import read_avro

    t = IcebergTable.load(path)
    snap = t.snapshot(snapshot_id=snapshot_id)
    with open(snap["manifest-list"], "rb") as f:
        _, manifests, _ = read_avro(f.read())
    def _first(m, *keys):
        # explicit None check — `or` would turn a legitimate 0 count
        # into the other key's value / NULL (review r4l)
        for k in keys:
            if m.get(k) is not None:
                return m[k]
        return None

    rows = [
        (
            m["manifest_path"],
            m.get("manifest_length"),
            int(m.get("content", 0)),
            m.get("added_snapshot_id"),
            _first(m, "added_files_count", "added_data_files_count"),
            _first(m, "existing_files_count", "existing_data_files_count"),
        )
        for m in manifests
    ]
    return spark.createDataFrame(
        rows,
        "manifest_path string, manifest_length long, content int, "
        "added_snapshot_id long, added_files long, existing_files long",
    )
