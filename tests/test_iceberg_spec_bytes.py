"""Golden-byte fixtures for the pure-Python Iceberg writer (r4 verdict
#3): the writer has no foreign implementation to cross-check in this
container (pyiceberg not installed; duckdb's iceberg extension needs a
network download — both attempts recorded in SURVEY §11), so these
tests pin the writer's BYTES against values hand-derived from the
published specs themselves:

- Avro 1.11 spec, "Binary encoding": zigzag varints, string/bytes
  length prefixes, record/array/union encodings, container magic.
- Iceberg table spec, "Binary single-value serialization" (Appendix D):
  the bound-encoding table.
- Iceberg table spec, "Manifests" / "Manifest lists": the reserved
  field-id assignments a foreign reader resolves by.

A writer-side drift in any of these would break foreign readers while
remaining invisible to self-round-trip tests.
"""

import json
import struct

from geomesa_sql_spark.io.avro import _zigzag, read_avro, write_avro
from geomesa_sql_spark.io.iceberg_meta import (
    _DATA_FILE_SCHEMA,
    _MANIFEST_ENTRY_SCHEMA,
    _MANIFEST_FILE_SCHEMA,
    _encode_bound,
)


# ---------------------------------------------------------- Avro layer


def test_avro_zigzag_goldens():
    """Avro spec: int/long values are zigzag-encoded then varint'd —
    the spec's own example table, plus the int64 extremes."""
    goldens = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        63: b"\x7e",
        64: b"\x80\x01",
        -65: b"\x81\x01",
        (1 << 63) - 1: b"\xfe" + b"\xff" * 8 + b"\x01",
        -(1 << 63): b"\xff" * 9 + b"\x01",
    }
    for v, want in goldens.items():
        assert _zigzag(v) == want, v


def test_avro_primitive_encodings_golden():
    """string = length varint + UTF-8; float/double little-endian IEEE;
    an EMPTY record contributes zero bytes (the unpartitioned
    ``partition`` tuple, field-id 102)."""
    import io

    from geomesa_sql_spark.io.avro import _encode

    schema = {
        "type": "record",
        "name": "g",
        "fields": [
            {"name": "p", "type": {"type": "record", "name": "r102",
                                   "fields": []}},
            {"name": "s", "type": "string"},
            {"name": "x", "type": "long"},
            {"name": "u", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
        ],
    }
    buf = io.BytesIO()
    _encode(buf, schema, {"p": {}, "s": "iceberg", "x": 1, "u": None,
                          "arr": [3]})
    # p: (nothing) | s: len 7 + utf8 | x: zigzag 1 | u: union idx 0
    # arr: count 1, item 3, end 0
    assert buf.getvalue() == (
        b"\x0eiceberg" + b"\x02" + b"\x00" + b"\x02\x06\x00"
    )
    buf2 = io.BytesIO()
    _encode(buf2, schema, {"p": {}, "s": "", "x": 0, "u": 5, "arr": []})
    # union non-null branch index is 1
    assert buf2.getvalue() == b"\x00" + b"\x00" + b"\x02\x0a" + b"\x00"


def test_avro_container_magic_and_schema_header():
    blob = write_avro(
        {"type": "record", "name": "t",
         "fields": [{"name": "x", "type": "long"}]},
        [{"x": 7}],
        codec="null",
    )
    assert blob[:4] == b"Obj\x01"  # Avro container spec magic
    _, rows, meta = read_avro(blob)
    assert rows == [{"x": 7}]
    assert meta["avro.codec"] == b"null"
    assert json.loads(meta["avro.schema"].decode())["name"] == "t"


# ----------------------------------------- Iceberg single-value bounds


def test_iceberg_single_value_serialization_goldens():
    """Iceberg spec Appendix D: bounds are little-endian fixed-width
    for numerics, raw UTF-8 for strings, 0x00/0x01 for booleans."""
    assert _encode_bound("boolean", False) == b"\x00"
    assert _encode_bound("boolean", True) == b"\x01"
    assert _encode_bound("int", 34) == b"\x22\x00\x00\x00"
    assert _encode_bound("int", -1) == b"\xff\xff\xff\xff"
    assert _encode_bound("long", 34) == b"\x22" + b"\x00" * 7
    assert _encode_bound("float", 1.0) == b"\x00\x00\x80\x3f"
    assert (
        _encode_bound("double", 1.0) == b"\x00\x00\x00\x00\x00\x00\xf0\x3f"
    )
    assert _encode_bound("string", "iceberg") == b"iceberg"
    # struct.pack round-trip sanity for a negative double
    assert _encode_bound("double", -2.5) == struct.pack("<d", -2.5)


# ------------------------------------------------- reserved field ids


def _ids(schema_fields):
    return {f["name"]: f["field-id"] for f in schema_fields}


def test_manifest_entry_field_ids_match_spec():
    """Iceberg spec 'Manifests': manifest_entry and data_file reserved
    field ids (v2). Foreign readers resolve columns BY ID — any drift
    here corrupts every field it touches."""
    assert _ids(_MANIFEST_ENTRY_SCHEMA["fields"]) == {
        "status": 0,
        "snapshot_id": 1,
        "data_file": 2,
        "sequence_number": 3,
        "file_sequence_number": 4,
    }
    want = {
        "content": 134,
        "file_path": 100,
        "file_format": 101,
        "partition": 102,
        "record_count": 103,
        "file_size_in_bytes": 104,
        "lower_bounds": 125,
        "upper_bounds": 128,
        "equality_ids": 135,
    }
    got = _ids(_DATA_FILE_SCHEMA["fields"])
    assert got == want
    # bound maps use the spec's key/value ids 126/127 and 129/130
    lo = next(f for f in _DATA_FILE_SCHEMA["fields"]
              if f["name"] == "lower_bounds")
    assert _ids(lo["type"][1]["items"]["fields"]) == {"key": 126, "value": 127}
    hi = next(f for f in _DATA_FILE_SCHEMA["fields"]
              if f["name"] == "upper_bounds")
    assert _ids(hi["type"][1]["items"]["fields"]) == {"key": 129, "value": 130}


def test_manifest_list_field_ids_match_spec():
    """Iceberg spec 'Manifest lists': manifest_file reserved ids."""
    assert _ids(_MANIFEST_FILE_SCHEMA["fields"]) == {
        "manifest_path": 500,
        "manifest_length": 501,
        "partition_spec_id": 502,
        "added_snapshot_id": 503,
        "added_files_count": 504,
        "existing_files_count": 505,
        "deleted_files_count": 506,
        "added_rows_count": 512,
        "existing_rows_count": 513,
        "deleted_rows_count": 514,
        "sequence_number": 515,
        "min_sequence_number": 516,
        "content": 517,
    }


# -------------------------------------------- end-to-end written bytes


def test_written_manifest_bytes_spec_shapes(spark, tmp_path):
    """Write a real table and inspect the RAW manifest file: container
    magic, field-ids embedded in the avro.schema header, the required
    unpartitioned ``partition`` tuple (field 102), and bound bytes that
    equal the hand-packed little-endian known values."""
    import glob

    from geomesa_sql_spark.io import iceberg_meta as im

    path = str(tmp_path / "golden")
    df = spark.createDataFrame(
        [(34, 1.0, "iceberg"), (40, 2.5, "zanzibar")],
        "k long, v double, s string",
    ).coalesce(1)
    im.create_table(df, path)

    mans = [
        p for p in glob.glob(f"{path}/metadata/*.avro")
        if "m0" in p.rsplit("/", 1)[-1]
    ]
    assert len(mans) == 1
    raw = open(mans[0], "rb").read()
    assert raw[:4] == b"Obj\x01"
    _, entries, meta = read_avro(raw)
    hdr = json.loads(meta["avro.schema"].decode())
    data_file = next(
        f for f in hdr["fields"] if f["name"] == "data_file"
    )["type"]
    ids = {f["name"]: f.get("field-id") for f in data_file["fields"]}
    assert ids["file_path"] == 100 and ids["partition"] == 102
    assert meta["format-version"] == b"2"

    e = entries[0]
    assert e["data_file"]["partition"] == {}
    lo = {x["key"]: x["value"] for x in e["data_file"]["lower_bounds"]}
    hi = {x["key"]: x["value"] for x in e["data_file"]["upper_bounds"]}
    # schema ids are 1-based in df column order: k=1, v=2, s=3
    assert lo[1] == struct.pack("<q", 34) and hi[1] == struct.pack("<q", 40)
    assert lo[2] == struct.pack("<d", 1.0) and hi[2] == struct.pack("<d", 2.5)
    assert lo[3] == b"iceberg" and hi[3] == b"zanzibar"
