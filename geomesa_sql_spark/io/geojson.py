"""Newline-delimited GeoJSON source/sink (GeoJSONL / GeoJSON Text
Sequences — the splittable form of RFC 7946).

A FeatureCollection file is ONE json document and cannot be split
across tasks, so at scale the interchange form is one Feature per
line (ndjson — what GDAL calls GeoJSONSeq and tippecanoe/BigQuery
emit). Read: distributed text scan → Arrow-batched parse to WKB +
properties-JSON; schema inference for properties reuses Spark's own
distributed JSON inference. Write: one JVM-side JSON assembly per row
(only the geometry text runs through a pandas UDF), plain text sink —
each task writes its own partition, no shuffle.

Geometry rides as WKB BinaryType like every other geo column in this
engine, so the full ST_ surface applies directly to read results.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_READ_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("geom", T.BinaryType()),
        T.StructField("properties", T.StringType()),
    ]
)


def read_geojsonl(
    spark: SparkSession,
    path: str,
    flatten: bool = True,
    stream: bool = False,
) -> DataFrame:
    """Read GeoJSONL → DataFrame [id, geom(WKB), <properties...>].

    Each line is a Feature (or a bare geometry object → NULL id/
    properties). Malformed lines and unparseable geometries become
    NULL geom rows rather than killing a large ingest. With
    ``flatten=False`` properties stay as one JSON-text column (no
    inference pass — single scan). With ``stream=True`` the source is
    ``readStream.text`` (files appearing under ``path`` become
    micro-batches — the drop-a-file ingest pattern); streaming cannot
    run the batch inference pass, so properties stay JSON text
    (``flatten`` ignored) — apply ``F.from_json`` with a known schema
    downstream."""
    import json

    from geomesa_sql_spark.geom.geojson import geom_from_geojson
    from geomesa_sql_spark.geom.wkb import geom_to_wkb

    def parse(batches):
        for pdf in batches:
            ids, geoms, props = [], [], []
            for line in pdf["value"]:
                fid = gwkb = pjson = None
                try:
                    obj = json.loads(line)
                    feat = obj if obj.get("type") == "Feature" else None
                    gobj = obj["geometry"] if feat else obj
                    if feat is not None:
                        if feat.get("id") is not None:
                            fid = str(feat["id"])
                        pjson = json.dumps(
                            feat.get("properties") or {}, separators=(",", ":")
                        )
                    if gobj is not None:
                        gwkb = geom_to_wkb(geom_from_geojson(gobj))
                except Exception:
                    pass  # malformed line → NULL row (constructor parity)
                ids.append(fid)
                geoms.append(gwkb)
                props.append(pjson)
            yield pd.DataFrame(
                {"id": ids, "geom": geoms, "properties": props}
            )

    if stream:
        return spark.readStream.text(path).mapInPandas(parse, _READ_SCHEMA)
    lines = spark.read.text(path)
    out = lines.mapInPandas(parse, _READ_SCHEMA)
    if not flatten:
        return out
    # properties schema from Spark's own JVM json inference over the
    # RAW FILES — zero Python, and crucially NOT a branch over the
    # mapInPandas parse stage (which would re-run the whole geometry
    # decode once for inference and again on first use — the
    # mapInPandas-recompute trap, review r3c). The inferred top-level
    # schema may type `geometry` inconsistently across rows; only the
    # `properties` struct field is taken from it.
    inferred = spark.read.json(path).schema
    pfield = next((f for f in inferred.fields if f.name == "properties"), None)
    if pfield is None or not isinstance(pfield.dataType, T.StructType):
        return out  # bare-geometry lines only (or no properties at all)
    schema = pfield.dataType
    flat_cols = [f.name for f in schema.fields if not f.name.startswith("_corrupt")]
    if not flat_cols:
        return out.drop("properties")
    parsed = out.withColumn("_p", F.from_json("properties", schema))
    # literal field access (getField — a dotted property name is NOT a
    # nested path) + collision-proof output aliases
    taken = {"id", "geom"} | set(flat_cols)
    sel = [F.col("id"), F.col("geom")]
    for c in flat_cols:
        if c in ("id", "geom"):
            # renamed away from the reserved outputs, never onto
            # another real property's name
            alias = f"prop_{c}"
            while alias in taken:
                alias = f"prop_{alias}"
            taken.add(alias)
        else:
            alias = c
        sel.append(parsed["_p"].getField(c).alias(alias))
    return parsed.select(*sel)


def write_geojsonl(
    df: DataFrame,
    path: str,
    geometry: str = "geom",
    id_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write [.., geom(WKB), ..] as one GeoJSON Feature per line.

    Every non-geometry column becomes a property (JVM to_json — no
    Python in the properties path); NULL geometry → ``"geometry":
    null`` per RFC 7946."""
    if geometry not in df.columns:
        raise ValueError(f"write_geojsonl: no column {geometry!r}")
    if id_col is not None and id_col not in df.columns:
        raise ValueError(f"write_geojsonl: no id column {id_col!r}")

    from geomesa_sql_spark.geom.geojson import geom_to_geojson
    from geomesa_sql_spark.geom.wkb import geom_from_wkb

    @F.pandas_udf(T.StringType())
    def _gj(wkb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None else geom_to_geojson(geom_from_wkb(bytes(b)))
                for b in wkb
            ],
            dtype=object,
        )

    prop_cols = [c for c in df.columns if c != geometry and c != id_col]
    parts = [F.lit('{"type":"Feature",')]
    if id_col is not None:
        # JSON-scalar encoding with proper string escaping: to_json only
        # accepts containers, so wrap in a 1-array and strip the
        # brackets (Column API, not string SQL — an id column named
        # `feature id` must not become a parse error)
        arr = F.to_json(F.array(F.col(id_col)))
        scalar = arr.substr(F.lit(2), F.length(arr) - F.lit(2))
        parts += [F.lit('"id":'), F.coalesce(scalar, F.lit("null")), F.lit(",")]
    parts += [
        F.lit('"geometry":'),
        F.coalesce(_gj(F.col(geometry)), F.lit("null")),
        F.lit(',"properties":'),
        # ignoreNullFields=false: null properties serialize as "k":null so
        # a round-trip preserves the full schema even for all-null columns
        F.to_json(F.struct(*prop_cols), {"ignoreNullFields": "false"})
        if prop_cols
        else F.lit("{}"),
        F.lit("}"),
    ]
    df.select(F.concat(*parts).alias("value")).write.mode(mode).text(path)
