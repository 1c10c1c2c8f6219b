"""Object-column encodings: JSON (and gated BSON) — the reference's
``object_encoding='json'`` path (fastparquet json.py:98-146, applied on
write at writer.py:203-224 and reversed on read via converted types).

The reference serializes arbitrary Python objects row-by-row with the
fastest available json library (orjson → ujson → json, json.py:17-97).
Spark-first re-expression: serialization IS a JVM expression —
``to_json`` / ``from_json`` run inside whole-stage codegen, so objects
never cross into Python at all; the resulting string column then rides
the normal block pipeline, where the codec auto-selector picks FSST or
dictionary for the JSON text.  BSON (json.py:149-171) gates on the
optional ``bson`` package exactly like the reference; it is absent from
this container, so the hook raises with the same actionable message the
compression registry uses for missing cramjam codecs.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def encode_json_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Serialize struct/map/array columns to JSON strings (JVM-side), in
    place — the write half of ``object_encoding='json'``.  The returned
    frame feeds ``encode_table`` like any other; JSON text compresses
    under the selector's string codecs (fsst/dict/linedict)."""
    for c in cols:
        df = df.withColumn(c, F.to_json(F.col(c)))
    return df


def decode_json_columns(df: DataFrame, schemas: dict[str, str]) -> DataFrame:
    """Parse JSON-encoded string columns back to typed columns — the read
    half.  ``schemas`` maps column name -> Spark DDL type string (the
    reference recovers types from its pandas metadata blob; an explicit
    schema is the Spark-native equivalent and lets Catalyst prune json
    fields that are never read)."""
    for c, ddl in schemas.items():
        df = df.withColumn(c, F.from_json(F.col(c), ddl))
    return df


def encode_bson_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """BSON object encoding (fastparquet json.py:149-171) — requires the
    optional ``bson`` package, exactly as in the reference."""
    try:
        import bson  # noqa: F401
    except ImportError as e:  # pragma: no cover - container lacks bson
        raise ImportError(
            "BSON object encoding needs the optional 'bson' package "
            "(absent from this container); use encode_json_columns — "
            "same reference surface, no extra dependency") from e
    import pandas as pd  # pragma: no cover - exercised only with bson

    def enc(it):  # pragma: no cover
        import bson as _b
        for pdf in it:
            for c in cols:
                pdf[c] = [_b.BSON.encode(v) for v in pdf[c]]
            yield pdf

    schema = ", ".join(
        f"{f.name} binary" if f.name in cols else f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields)
    return df.mapInPandas(enc, schema)  # pragma: no cover
