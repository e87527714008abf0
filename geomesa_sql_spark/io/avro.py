"""Generic Avro Object Container File codec (pure stdlib).

Iceberg's table metadata sidecars — manifest lists and manifests — are
Avro OCF files, so a from-scratch Iceberg reader (``io/iceberg_meta``)
needs a generic Avro decoder driven by the *embedded writer schema*
(foreign manifests carry arbitrary field-id annotations and optional
fields we must not hard-code). The reference engine reads GeoMesa
Avro/Kryo features through GeoTools; this module plays the analogous
serialization role on the lakehouse-metadata side of the graft.

Spec: Apache Avro 1.11 specification (container file + binary
encoding). Supported codecs: ``null`` and ``deflate`` (raw DEFLATE,
``zlib`` wbits=-15). Decoding is schema-complete for the types Iceberg
metadata uses (and the rest of the scalar surface): null/boolean/int/
long/float/double/bytes/string/fixed/enum/array/map/union/record plus
named-type references. Logical types are left as their underlying
primitives (Iceberg bounds are opaque single-value bytes anyway).

Writing takes (schema dict, rows as plain dicts) and encodes unions by
null-vs-value (sufficient for ``["null", X]`` options, the only union
shape Iceberg schemas use). Round trips are pinned in test_avro.py;
mutation robustness rides the same clean-error contract as the media
codecs.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from geomesa_sql_spark.io.errors import clean_decode

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- read


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        # n < 0 would slice empty AND move the cursor backwards — an
        # infinite parse loop on corrupt varints, not just a bad read
        if n < 0 or self.pos + n > len(self.data):
            raise ValueError("truncated Avro data")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        """Zigzag varint."""
        shift = 0
        acc = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("truncated Avro varint")
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("Avro varint too long")
        return (acc >> 1) ^ -(acc & 1)


def _resolve(schema, names: dict):
    """Register named types and resolve string references."""
    if isinstance(schema, str):
        if schema in names:
            return names[schema]
        return schema  # primitive name
    if isinstance(schema, list):
        return [_resolve(s, names) for s in schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            # register under full name + short name
            name = schema.get("name")
            ns = schema.get("namespace")
            if name:
                names[name] = schema
                if ns:
                    names[f"{ns}.{name}"] = schema
        if t == "record":
            for f in schema.get("fields", ()):
                f["type"] = _resolve(f["type"], names)
        elif t == "array":
            schema["items"] = _resolve(schema["items"], names)
        elif t == "map":
            schema["values"] = _resolve(schema["values"], names)
        return schema
    raise ValueError(f"bad Avro schema node: {schema!r}")


def _decode(r: _Reader, schema):
    if isinstance(schema, list):  # union
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"Avro union index {idx} out of range")
        return _decode(r, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = r.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    r.long()  # byte size, unused
                for _ in range(n):
                    out.append(_decode(r, schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    r.long()
                for _ in range(n):
                    k = r.read(r.long()).decode("utf-8")
                    out[k] = _decode(r, schema["values"])
            return out
        if t == "fixed":
            return r.read(schema["size"])
        if t == "enum":
            syms = schema["symbols"]
            i = r.long()
            if not 0 <= i < len(syms):
                raise ValueError("Avro enum index out of range")
            return syms[i]
        schema = t  # {"type": "long", ...} primitive wrapper
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) != b"\x00"
    if schema in ("int", "long"):
        return r.long()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "bytes":
        n = r.long()
        if n < 0:
            raise ValueError("negative Avro bytes length")
        return r.read(n)
    if schema == "string":
        n = r.long()
        if n < 0:
            raise ValueError("negative Avro string length")
        return r.read(n).decode("utf-8")
    raise ValueError(f"unsupported Avro type {schema!r}")


@clean_decode
def read_avro(data: bytes) -> tuple[dict, list, dict]:
    """OCF bytes -> (schema dict, rows, file-metadata dict)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.read(r.long()).decode("utf-8")
            meta[k] = r.read(r.long())
    schema = _resolve(json.loads(meta["avro.schema"]), {})
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} (null/deflate only)")
    sync = r.read(16)
    rows: list = []
    while r.pos < len(r.data):
        count = r.long()
        size = r.long()
        if count < 0 or size < 0:
            raise ValueError("negative Avro block header")
        block = r.read(size)
        if codec == "deflate":
            try:
                block = zlib.decompress(block, wbits=-15)
            except zlib.error as ex:
                raise ValueError(f"corrupt deflate block: {ex}") from ex
        br = _Reader(block)
        for _ in range(count):
            rows.append(_decode(br, schema))
        if br.pos != len(block):
            raise ValueError("Avro block with trailing bytes")
        if r.read(16) != sync:
            raise ValueError("Avro sync marker mismatch")
    return schema, rows, meta


# --------------------------------------------------------------- write


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(buf: io.BytesIO, schema, value) -> None:
    if isinstance(schema, list):  # union: null vs the single other branch
        if value is None and "null" in schema:
            buf.write(_zigzag(schema.index("null")))
            return
        for i, branch in enumerate(schema):
            if branch != "null":
                buf.write(_zigzag(i))
                _encode(buf, branch, value)
                return
        raise ValueError("union with no non-null branch for a value")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                if f["name"] not in value and "default" in f:
                    _encode(buf, f["type"], f["default"])
                else:
                    _encode(buf, f["type"], value[f["name"]])
            return
        if t == "array":
            if value:
                buf.write(_zigzag(len(value)))
                for v in value:
                    _encode(buf, schema["items"], v)
            buf.write(_zigzag(0))
            return
        if t == "map":
            if value:
                buf.write(_zigzag(len(value)))
                for k, v in value.items():
                    kb = k.encode("utf-8")
                    buf.write(_zigzag(len(kb)) + kb)
                    _encode(buf, schema["values"], v)
            buf.write(_zigzag(0))
            return
        if t == "fixed":
            if len(value) != schema["size"]:
                raise ValueError("fixed size mismatch")
            buf.write(value)
            return
        if t == "enum":
            buf.write(_zigzag(schema["symbols"].index(value)))
            return
        schema = t
    if schema == "null":
        return
    if schema == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif schema in ("int", "long"):
        buf.write(_zigzag(int(value)))
    elif schema == "float":
        buf.write(struct.pack("<f", value))
    elif schema == "double":
        buf.write(struct.pack("<d", value))
    elif schema == "bytes":
        buf.write(_zigzag(len(value)) + bytes(value))
    elif schema == "string":
        vb = value.encode("utf-8")
        buf.write(_zigzag(len(vb)) + vb)
    else:
        raise ValueError(f"unsupported Avro type {schema!r}")


def write_avro(
    schema: dict,
    rows: list,
    codec: str = "deflate",
    meta: dict | None = None,
    block_rows: int = 1000,
) -> bytes:
    """(schema dict, rows as dicts) -> OCF bytes. Deterministic sync
    marker derived from the schema so identical writes are
    byte-identical (checkpoint/lineage friendly)."""
    import hashlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = hashlib.md5(schema_json.encode() + len(rows).to_bytes(8, "big")).digest()
    head = io.BytesIO()
    head.write(MAGIC)
    md = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    for k, v in (meta or {}).items():
        md[k] = v if isinstance(v, bytes) else str(v).encode()
    head.write(_zigzag(len(md)))
    for k, v in md.items():
        kb = k.encode()
        head.write(_zigzag(len(kb)) + kb + _zigzag(len(v)) + v)
    head.write(_zigzag(0))
    head.write(sync)
    resolved = _resolve(json.loads(schema_json), {})
    # empty row list → header with ZERO blocks (the spec-clean empty
    # file; a count=0 block trips strict readers — review r4m)
    for start in range(0, len(rows), block_rows):
        blk = rows[start : start + block_rows]
        body = io.BytesIO()
        for row in blk:
            _encode(body, resolved, row)
        raw = body.getvalue()
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = c.compress(raw) + c.flush()
        head.write(_zigzag(len(blk)) + _zigzag(len(raw)) + raw + sync)
    return head.getvalue()
