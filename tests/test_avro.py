"""Pure-Python Avro reader: golden bytes, round-trip via an independent
spec-driven encoder, codecs, nested/logical types, and the distributed
read path (binaryFile + mapInPandas)."""

from __future__ import annotations

import datetime
import json
import struct
import zlib

import pytest

from datafusion_python_spark.sources.avro import (
    avro_to_spark_schema,
    decode_container,
    read_avro,
)


# -- minimal independent encoder (written from the Avro spec, used only
#    to produce test fixtures — not an inverse of the decoder code) ------


def zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def enc_bytes(b: bytes) -> bytes:
    return zigzag(len(b)) + b


def enc_str(s: str) -> bytes:
    return enc_bytes(s.encode("utf-8"))


def encode_value(schema, v) -> bytes:
    if isinstance(schema, list):  # [null, X]
        if v is None:
            return zigzag(schema.index("null"))
        branch = next(i for i, b in enumerate(schema) if b != "null")
        return zigzag(branch) + encode_value(schema[branch], v)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        logical = schema.get("logicalType")
        if t == "int" and logical == "date":
            return zigzag((v - datetime.date(1970, 1, 1)).days)
        if t == "long" and logical == "timestamp-micros":
            return zigzag(int(v.timestamp() * 1_000_000))
        if t == "record":
            out = b""
            for f in schema["fields"]:
                out += encode_value(f["type"], v[f["name"]])
            return out
        if t == "enum":
            return zigzag(schema["symbols"].index(v))
        if t == "array":
            if not v:
                return zigzag(0)
            return (
                zigzag(len(v))
                + b"".join(encode_value(schema["items"], x) for x in v)
                + zigzag(0)
            )
        if t == "map":
            if not v:
                return zigzag(0)
            body = b"".join(
                enc_str(k) + encode_value(schema["values"], val)
                for k, val in v.items()
            )
            return zigzag(len(v)) + body + zigzag(0)
        if t == "fixed":
            return v
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return zigzag(v)
    if t == "float":
        return struct.pack("<f", v)
    if t == "double":
        return struct.pack("<d", v)
    if t == "bytes":
        return enc_bytes(v)
    if t == "string":
        return enc_str(v)
    if "." in t:  # fullname reference to a named fixed type (test helper)
        return v
    raise AssertionError(t)


SYNC = bytes(range(16))


def make_container(schema: dict, rows: list, codec: str = "null") -> bytes:
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out = b"Obj\x01" + zigzag(len(meta))
    for k, v in meta.items():
        out += enc_str(k) + enc_bytes(v)
    out += zigzag(0) + SYNC
    body = b"".join(encode_value(schema, r) for r in rows)
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        body = co.compress(body) + co.flush()
    out += zigzag(len(rows)) + enc_bytes(body) + SYNC
    return out


RECORD_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "Inner",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
    ],
}

ROWS = [
    {
        "id": 1,
        "title": "hello",
        "score": 1.5,
        "flag": True,
        "opt": "yes",
        "tags": ["a", "b"],
        "attrs": {"k": 7},
        "kind": "A",
        "d": datetime.date(2020, 5, 17),
        "ts": datetime.datetime(2020, 5, 17, 12, 30, 0),
        "nested": {"x": 42},
    },
    {
        "id": 2,
        "title": "wörld ✓",
        "score": -0.25,
        "flag": False,
        "opt": None,
        "tags": [],
        "attrs": {},
        "kind": "B",
        "d": datetime.date(1969, 12, 31),
        "ts": datetime.datetime(1969, 12, 31, 23, 59, 59),
        "nested": {"x": -1},
    },
]


def test_golden_minimal_bytes():
    """Handcrafted container: {"type":"record","name":"R","fields":
    [{"name":"n","type":"long"}]} with rows n=3, n=-3 (spec examples:
    zigzag(3)=0x06, zigzag(-3)=0x05)."""
    schema = b'{"type":"record","name":"R","fields":[{"name":"n","type":"long"}]}'
    raw = (
        b"Obj\x01"
        + b"\x02"  # 1 metadata entry
        + b"\x16avro.schema"  # len 11 (zigzag 0x16)
        + zigzag(len(schema))
        + schema
        + b"\x00"  # end of metadata
        + SYNC
        + b"\x04"  # 2 rows
        + b"\x04"  # 2 bytes of data
        + b"\x06\x05"  # 3, -3
        + SYNC
    )
    assert list(decode_container(raw)) == [(3,), (-3,)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_decode_roundtrip(codec):
    raw = make_container(RECORD_SCHEMA, ROWS, codec=codec)
    rows = list(decode_container(raw))
    assert len(rows) == 2
    r0 = rows[0]
    assert r0[0] == 1 and r0[1] == "hello" and r0[2] == 1.5 and r0[3] is True
    assert r0[4] == "yes" and r0[5] == ["a", "b"] and r0[6] == {"k": 7}
    assert r0[7] == "A"
    assert r0[8] == datetime.date(2020, 5, 17)
    assert r0[9] == datetime.datetime(2020, 5, 17, 12, 30, 0)
    assert r0[10] == (42,)
    r1 = rows[1]
    assert r1[1] == "wörld ✓" and r1[4] is None and r1[5] == [] and r1[6] == {}


def test_spark_schema_mapping():
    s = avro_to_spark_schema(RECORD_SCHEMA)
    d = {f.name: f for f in s.fields}
    assert d["id"].dataType.typeName() == "long"
    assert d["opt"].dataType.typeName() == "string" and d["opt"].nullable
    assert d["tags"].dataType.typeName() == "array"
    assert d["attrs"].dataType.typeName() == "map"
    assert d["d"].dataType.typeName() == "date"
    # timestamp-micros is an instant per the Avro spec → TIMESTAMP
    # (matches spark-avro); local-timestamp-* would map to NTZ
    assert d["ts"].dataType.typeName() == "timestamp"
    lts = avro_to_spark_schema(
        {
            "type": "record",
            "name": "L",
            "fields": [
                {
                    "name": "lts",
                    "type": {"type": "long", "logicalType": "local-timestamp-micros"},
                }
            ],
        }
    )
    assert lts.fields[0].dataType.typeName() == "timestamp_ntz"
    assert d["nested"].dataType.typeName() == "struct"


def test_non_record_top_level():
    """A bare top-level 'string'/'long' schema decodes as 1-tuples (the
    'value' struct wrap), not per-character zips or task TypeErrors."""
    schema = b'"string"'
    raw = (
        b"Obj\x01"
        + b"\x02"
        + b"\x16avro.schema"
        + zigzag(len(schema))
        + schema
        + b"\x00"
        + SYNC
        + b"\x04"  # 2 rows
        + zigzag(len(enc_str("ab") + enc_str("xyz")))
        + enc_str("ab")
        + enc_str("xyz")
        + SYNC
    )
    assert list(decode_container(raw)) == [("ab",), ("xyz",)]
    s = avro_to_spark_schema("string")
    assert [f.name for f in s.fields] == ["value"]


def test_namespaced_named_type_roundtrip():
    """Fullname references (ns.Name) resolve; same short name in a second
    namespace does not shadow the first registration."""
    schema = {
        "type": "record",
        "name": "Outer",
        "namespace": "com.example",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "fixed",
                    "name": "F2",
                    "namespace": "com.example",
                    "size": 2,
                },
            },
            # reference by fullname — pre-fix this raised KeyError
            {"name": "b", "type": "com.example.F2"},
        ],
    }
    rows = [{"a": b"xy", "b": b"zw"}]
    raw = make_container(schema, rows)
    assert list(decode_container(raw)) == [(b"xy", b"zw")]
    s = avro_to_spark_schema(schema)
    assert [f.name for f in s.fields] == ["a", "b"]


def test_read_avro_distributed(spark, tmp_path):
    for i, codec in enumerate(["null", "deflate"]):
        (tmp_path / f"part{i}.avro").write_bytes(
            make_container(RECORD_SCHEMA, ROWS, codec=codec)
        )
    df = read_avro(spark, str(tmp_path))
    assert df.count() == 4  # 2 files x 2 rows, decoded in parallel tasks
    got = {(r.id, r.title, r.opt, r.nested.x) for r in df.collect()}
    assert (1, "hello", "yes", 42) in got and (2, "wörld ✓", None, -1) in got
    tags = {tuple(r.tags) for r in df.collect()}
    assert ("a", "b") in tags and () in tags


def test_read_avro_via_context(spark, tmp_path):
    from datafusion_python_spark.api.context import SessionContext

    (tmp_path / "one.avro").write_bytes(make_container(RECORD_SCHEMA, ROWS))
    ctx = SessionContext()
    df = ctx.read_avro(str(tmp_path / "one.avro"))
    assert df.count() == 2
    ctx.register_avro("avro_docs", str(tmp_path / "one.avro"))
    assert spark.sql("SELECT count(*) AS n FROM avro_docs").collect()[0].n == 2


def test_unsupported_union_raises():
    bad = {
        "type": "record",
        "name": "U",
        "fields": [{"name": "u", "type": ["int", "string"]}],
    }
    with pytest.raises(NotImplementedError):
        avro_to_spark_schema(bad)


def test_unsupported_codec_raises(tmp_path):
    raw = make_container(RECORD_SCHEMA, ROWS)
    # rewrite codec metadata by rebuilding with a fake codec
    meta_schema = json.dumps(RECORD_SCHEMA).encode()
    out = b"Obj\x01" + zigzag(2)
    out += enc_str("avro.schema") + enc_bytes(meta_schema)
    out += enc_str("avro.codec") + enc_bytes(b"snappy")
    out += zigzag(0) + SYNC
    out += zigzag(1) + enc_bytes(b"\x00") + SYNC
    with pytest.raises(NotImplementedError, match="snappy"):
        list(decode_container(out))
    assert raw  # silence unused warning
