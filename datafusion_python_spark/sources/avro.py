"""Avro object-container reads without the spark-avro jar.

The reference registers Avro files as first-class tables
(ref context.py:1266 register_avro, context.py:1994 read_avro). Spark's
Avro support lives in an external module (org.apache.spark:spark-avro)
that is not on this container's classpath, so this module implements the
Avro 1.x object-container format (spec: avro.apache.org, public) in pure
Python and distributes decoding with Spark primitives:

- file distribution via ``spark.read.format("binaryFile")`` — one task
  per file, so a directory of N files decodes N-wide in parallel;
- per-file block decoding inside ``mapInPandas`` (Arrow-batched — rows
  stream out in pandas batches, never a driver-side materialization);
- the writer schema is parsed from the first file's header on the driver
  (O(KB)) to derive the Spark schema; each task re-parses its own file's
  header, so mixed-schema directories fail loudly rather than mis-decode.

Supported: all Avro primitives, records (nested), enums, arrays, maps,
fixed, ``[null, X]`` unions (→ nullable X), and the common logical types
(date; timestamp-millis/micros → TIMESTAMP, the instant semantics the
Avro spec and spark-avro assign them; local-timestamp-* → TIMESTAMP_NTZ;
decimal over bytes/fixed). Named-type references resolve by fullname
(namespace.name) with aliases, per the spec's name rules. Codecs: null
and deflate (stdlib zlib). Snappy needs a lib this container lacks —
clear error. General multi-branch unions have no Spark analogue and
raise with the member list.

Scale note: parallelism is per-file (binaryFile does not split), which
matches how Avro corpora are laid out in practice (many ~128 MB files).
A single multi-GB file would decode in one task — repartition upstream
or prefer the spark-avro jar for that shape.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# Binary decoder (Avro spec §"Binary encoding")


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        """Zigzag varint (int and long share the wire format)."""
        shift = 0
        acc = 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _decimal_from_bytes(raw: bytes, scale: int):
    import decimal

    unscaled = int.from_bytes(raw, "big", signed=True)
    return decimal.Decimal(unscaled).scaleb(-scale)


def _register_named(schema: dict, named: dict[str, Any]) -> None:
    """Register a named type (record/enum/fixed/error) for later
    reference resolution, per the Avro spec's name rules: the key is the
    FULLNAME (namespace.name — a dotted ``name`` attribute wins over the
    ``namespace`` attribute), plus any ``aliases``; the bare short name
    is kept as a convenience key only when unclaimed, so two same-named
    types in different namespaces don't silently shadow each other."""
    name = schema["name"]
    ns = schema.get("namespace")
    full = name if "." in name else (f"{ns}.{name}" if ns else name)
    named.setdefault(full, schema)
    named.setdefault(full.rsplit(".", 1)[-1], schema)
    for alias in schema.get("aliases", []):
        a_full = alias if "." in alias else (f"{ns}.{alias}" if ns else alias)
        named.setdefault(a_full, schema)


def _make_decoder(schema: Any, named: dict[str, Any]) -> Callable[[_Reader], Any]:
    """Compile an Avro (JSON-decoded) schema node to a decode function."""
    if isinstance(schema, str):
        if schema in named:
            return _make_decoder(named[schema], named)
        t = schema
        if t == "null":
            return lambda r: None
        if t == "boolean":
            return lambda r: r.read(1) != b"\x00"
        if t in ("int", "long"):
            return _Reader.read_long
        if t == "float":
            return lambda r: struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return lambda r: struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return _Reader.read_bytes
        if t == "string":
            return lambda r: r.read_bytes().decode("utf-8")
        raise ValueError(f"unknown avro type {t!r}")

    if isinstance(schema, list):  # union
        branches = schema
        nn = [b for b in branches if b != "null"]
        if len(nn) != 1:
            raise NotImplementedError(
                f"general avro unions have no Spark column type; got {branches}"
            )
        decoders = [_make_decoder(b, named) for b in branches]

        def dec_union(r: _Reader):
            return decoders[r.read_long()](r)

        return dec_union

    t = schema["type"]
    logical = schema.get("logicalType")

    if t in ("record", "error"):
        _register_named(schema, named)
        field_decoders = [
            _make_decoder(f["type"], named) for f in schema["fields"]
        ]

        def dec_record(r: _Reader):
            return tuple(d(r) for d in field_decoders)

        return dec_record

    if t == "enum":
        _register_named(schema, named)
        symbols = schema["symbols"]
        return lambda r: symbols[r.read_long()]

    if t == "array":
        item = _make_decoder(schema["items"], named)

        def dec_array(r: _Reader):
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    r.read_long()
                out.extend(item(r) for _ in range(n))

        return dec_array

    if t == "map":
        val = _make_decoder(schema["values"], named)

        def dec_map(r: _Reader):
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    # assignment evaluates the RHS first — decode the key
                    # explicitly before the value to preserve wire order
                    k = r.read_bytes().decode("utf-8")
                    out[k] = val(r)

        return dec_map

    if t == "fixed":
        _register_named(schema, named)
        size = schema["size"]
        if logical == "decimal":
            scale = schema.get("scale", 0)
            return lambda r: _decimal_from_bytes(r.read(size), scale)
        return lambda r: r.read(size)

    if t == "bytes" and logical == "decimal":
        scale = schema.get("scale", 0)
        return lambda r: _decimal_from_bytes(r.read_bytes(), scale)

    if t == "int" and logical == "date":
        import datetime

        epoch = datetime.date(1970, 1, 1)
        day = datetime.timedelta(days=1)
        return lambda r: epoch + day * r.read_long()

    if t == "long" and logical in (
        "timestamp-micros",
        "timestamp-millis",
        "local-timestamp-micros",
        "local-timestamp-millis",
    ):
        import datetime

        mult = 1 if logical.endswith("micros") else 1000
        epoch = datetime.datetime(1970, 1, 1)

        def dec_ts(r: _Reader):
            # naive UTC wall-clock; exact for the instant (timestamp-*)
            # types under the library's pinned-UTC session, and the
            # stored wall-clock for local-timestamp-* (NTZ)
            return epoch + datetime.timedelta(microseconds=r.read_long() * mult)

        return dec_ts

    # {"type": <primitive-or-named>, ...} wrapper (attrs/unused logicals)
    return _make_decoder(t, named)


# --------------------------------------------------------------------------
# Avro schema → Spark type


def _to_spark_type(schema: Any, named: dict[str, Any]) -> tuple[T.DataType, bool]:
    """Returns (dtype, nullable)."""
    if isinstance(schema, str):
        if schema in named:
            return _to_spark_type(named[schema], named)
        prim = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
            "null": T.NullType(),
        }
        return prim[schema], False
    if isinstance(schema, list):
        nn = [b for b in schema if b != "null"]
        if len(nn) != 1:
            raise NotImplementedError(
                f"general avro unions have no Spark column type; got {schema}"
            )
        dt, _ = _to_spark_type(nn[0], named)
        return dt, True

    t = schema["type"]
    logical = schema.get("logicalType")
    if t in ("record", "error"):
        _register_named(schema, named)
        fields = []
        for f in schema["fields"]:
            dt, nullable = _to_spark_type(f["type"], named)
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields), False
    if t == "enum":
        _register_named(schema, named)
        return T.StringType(), False
    if t == "array":
        dt, nullable = _to_spark_type(schema["items"], named)
        return T.ArrayType(dt, containsNull=nullable), False
    if t == "map":
        dt, nullable = _to_spark_type(schema["values"], named)
        return T.MapType(T.StringType(), dt, valueContainsNull=nullable), False
    if t == "fixed":
        _register_named(schema, named)
        if logical == "decimal":
            return (
                T.DecimalType(schema.get("precision", 38), schema.get("scale", 0)),
                False,
            )
        return T.BinaryType(), False
    if t == "bytes" and logical == "decimal":
        return (
            T.DecimalType(schema.get("precision", 38), schema.get("scale", 0)),
            False,
        )
    if t == "int" and logical == "date":
        return T.DateType(), False
    if t == "long" and logical in ("timestamp-micros", "timestamp-millis"):
        # Avro spec: timestamp-* are UTC instants → TimestampType (same
        # mapping as spark-avro, so the jar-present and pure-Python code
        # paths in context.read_avro agree on the schema)
        return T.TimestampType(), False
    if t == "long" and logical in ("local-timestamp-micros", "local-timestamp-millis"):
        # local-timestamp-* are zone-less wall clocks → TIMESTAMP_NTZ
        return T.TimestampNTZType(), False
    return _to_spark_type(t, named)


# --------------------------------------------------------------------------
# Container parsing


def _parse_header(r: _Reader) -> tuple[dict, bytes]:
    """Returns (metadata dict, 16-byte sync marker)."""
    if r.read(4) != MAGIC:
        raise ValueError("not an avro object container (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            key = r.read_bytes().decode("utf-8")
            meta[key] = r.read_bytes()
    sync = r.read(16)
    return meta, sync


def _decompress(codec: str, block: bytes) -> bytes:
    if codec in ("", "null"):
        return block
    if codec == "deflate":
        return zlib.decompress(block, -15)
    raise NotImplementedError(
        f"avro codec {codec!r} needs a library this environment lacks; "
        "supported here: null, deflate"
    )


def _is_record_schema(schema: Any) -> bool:
    return isinstance(schema, dict) and schema.get("type") in ("record", "error")


def decode_container(raw: bytes) -> Iterator[tuple]:
    """Yield decoded row tuples from one Avro container file's bytes.

    Non-record top-level writer schemas (a bare ``"long"``, an array, …)
    decode to scalars; they are wrapped as 1-tuples here, mirroring the
    single-field struct that :func:`avro_to_spark_schema` wraps them in —
    otherwise downstream ``zip(*rows)`` column-transposes would iterate a
    scalar (chars of a string) or fail mid-task.
    """
    r = _Reader(raw)
    meta, sync = _parse_header(r)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    dec = _make_decoder(schema, {})
    wrap = not _is_record_schema(schema)
    while not r.at_end():
        n_rows = r.read_long()
        block = _decompress(codec, r.read_bytes())
        if r.read(16) != sync:
            raise ValueError("avro block sync mismatch (corrupt file)")
        br = _Reader(block)
        for _ in range(n_rows):
            v = dec(br)
            yield (v,) if wrap else v


def read_file_schema(path: str) -> Any:
    """Writer schema (JSON-decoded) from a container file's header."""
    with open(path, "rb") as f:
        head = f.read(1 << 20)  # header is tiny; 1 MB covers any metadata
    meta, _ = _parse_header(_Reader(head))
    return json.loads(meta["avro.schema"].decode("utf-8"))


def avro_to_spark_schema(avro_schema: Any) -> T.StructType:
    dt, _ = _to_spark_type(avro_schema, {})
    if not isinstance(dt, T.StructType):
        dt = T.StructType([T.StructField("value", dt, True)])
    return dt


def read_avro(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    file_extension: str = ".avro",
) -> DataFrame:
    """Distributed Avro read (ref context.py:1994 read_avro).

    ``schema`` overrides the Spark schema derived from the first file's
    writer schema (the files are still decoded with their own writer
    schema; the override must be assignment-compatible).
    """
    import glob as _glob
    import os

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, f"*{file_extension}")))
    else:
        files = sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]
    if not files:
        raise FileNotFoundError(f"no {file_extension} files under {path!r}")

    spark_schema = schema or avro_to_spark_schema(read_file_schema(files[0]))
    n_fields = len(spark_schema.fields)
    names = [f.name for f in spark_schema.fields]

    binary = spark.read.format("binaryFile").load(files)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                rows = list(decode_container(bytes(content)))
                if not rows:
                    continue
                cols = list(zip(*rows)) if rows else [[]] * n_fields
                yield pd.DataFrame(
                    {name: list(vals) for name, vals in zip(names, cols)}
                )

    return binary.select("content").mapInPandas(decode, schema=spark_schema)
