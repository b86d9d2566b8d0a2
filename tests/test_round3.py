"""Round-3 tests: array_remove first-vs-all semantics
(ref python/datafusion/functions/__init__.py:4126-4199) and the
pure-numpy JPEG/GIF codecs that close the multimodal entropy-decode gap."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

import datafusion_python_spark.api.functions as dpf
from datafusion_python_spark.api.expr import Expr
from datafusion_python_spark.operators.codecs import (
    decode_gif,
    decode_image,
    encode_gif,
)
from datafusion_python_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _arr(*vals):
    return Expr(F.array(*[F.lit(v) for v in vals]))


def test_array_remove_first_only(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    got = df.select(dpf.array_remove(_arr(1, 2, 1), dpf.lit(1)).expr.alias("r")).first()["r"]
    assert got == [2, 1]  # ref docstring example: removes FIRST match only


def test_array_remove_n(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    got = df.select(
        dpf.array_remove_n(_arr(1, 2, 1, 1), dpf.lit(1), 2).expr.alias("r")
    ).first()["r"]
    assert got == [2, 1]
    # n larger than match count removes all matches, keeps the rest
    got = df.select(
        dpf.array_remove_n(_arr(1, 2, 1), dpf.lit(1), 9).expr.alias("r")
    ).first()["r"]
    assert got == [2]
    # n = 0 removes nothing
    got = df.select(
        dpf.array_remove_n(_arr(1, 2, 1), dpf.lit(1), 0).expr.alias("r")
    ).first()["r"]
    assert got == [1, 2, 1]
    # value absent → unchanged
    got = df.select(
        dpf.array_remove_n(_arr(1, 2), dpf.lit(7), 1).expr.alias("r")
    ).first()["r"]
    assert got == [1, 2]


def test_array_remove_all(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    got = df.select(
        dpf.array_remove_all(_arr(1, 2, 1), dpf.lit(1)).expr.alias("r")
    ).first()["r"]
    assert got == [2]


def test_array_remove_null_array_passthrough(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    null_arr = Expr(F.lit(None).cast("array<int>"))
    got = df.select(dpf.array_remove(null_arr, dpf.lit(1)).expr.alias("r")).first()["r"]
    assert got is None


# --- reference-behavior parity (tests/test_indexing.py, test_unparser.py) ---


def test_dataframe_indexing(spark):
    from datafusion_python_spark.api.context import SessionContext

    ctx = SessionContext()
    df = ctx.from_pydict({"a": [1, 2, 3], "b": [4, 4, 6]}, "t_r3_idx")
    assert df["a"].to_pylist() == [{"a": 1}, {"a": 2}, {"a": 3}]
    assert df["a", "b"].df.columns == ["a", "b"]
    assert df[("a", "b")].df.columns == ["a", "b"]
    assert df[["a"]].df.columns == ["a"]
    import pytest

    with pytest.raises(Exception) as e_info:
        df["c"]
    for e in ["Schema error", "No field named c"]:
        assert e in e_info.value.args[0]
    with pytest.raises(Exception) as e_info:
        df[1]
    assert "DataFrame can only be indexed by string index or indices" in e_info.value.args[0]


def test_read_csv_json_path_lists(spark, tmp_path):
    # ref io.py: read_csv/read_json accept lists of paths (and pathlib)
    from datafusion_python_spark.api.context import SessionContext

    ctx = SessionContext()
    for i in (1, 2):
        (tmp_path / f"f{i}.csv").write_text(f"a,b\n{i},{i * 10}\n")
        (tmp_path / f"f{i}.json").write_text('{"a": %d}\n' % i)
    csv_paths = [str(tmp_path / "f1.csv"), str(tmp_path / "f2.csv")]
    assert sorted(r["a"] for r in ctx.read_csv(csv_paths).to_pylist()) == [1, 2]
    json_paths = [tmp_path / "f1.json", tmp_path / "f2.json"]  # pathlib ok
    assert sorted(r["a"] for r in ctx.read_json(json_paths).to_pylist()) == [1, 2]


def test_from_arrow_c_protocols(spark):
    # ref from_arrow: accepts __arrow_c_stream__ AND __arrow_c_array__ objects
    import pyarrow as pa

    from datafusion_python_spark.api.context import SessionContext

    ctx = SessionContext()
    tbl = pa.table({"a": [1, 2, 3]})

    class StreamOnly:
        def __arrow_c_stream__(self, requested_schema=None):
            return tbl.__arrow_c_stream__(requested_schema)

    class ArrayOnly:
        def __arrow_c_array__(self, requested_schema=None):
            return tbl.to_batches()[0].__arrow_c_array__(requested_schema)

    assert ctx.from_arrow(StreamOnly()).to_pylist() == [{"a": 1}, {"a": 2}, {"a": 3}]
    assert ctx.from_arrow(ArrayOnly()).to_pylist() == [{"a": 1}, {"a": 2}, {"a": 3}]


def test_lit_pyarrow_scalar(spark):
    # ref tests/test_expr.py test_round_trip_pyscalar_value
    import pyarrow as pa

    from datafusion_python_spark.api.context import SessionContext

    ctx = SessionContext()
    df = ctx.from_pydict({"a": [1]}, "t_r3_sc")
    out = df.select(
        dpf.lit(pa.scalar(42)).alias("i64"),
        dpf.lit(pa.scalar(7, pa.int32())).alias("i32"),
        dpf.lit(pa.scalar("s")).alias("s"),
        dpf.lit(pa.scalar([1, 2], pa.list_(pa.int64()))).alias("arr"),
        dpf.lit(pa.scalar(None, pa.string())).alias("nul"),
    )
    row = out.to_pylist()[0]
    assert (row["i64"], row["i32"], row["s"], row["arr"], row["nul"]) == (
        42, 7, "s", [1, 2], None,
    )
    types = dict(out.df.dtypes)
    assert types["i32"] == "int" and types["i64"] == "bigint"  # arrow type kept


def test_sql_statement_shims(spark):
    # ref tests/test_expr.py test_create_index/test_transaction_start/_end:
    # the reference parses these; execution is a no-op there too
    from datafusion_python_spark.api.context import SessionContext, SQLOptions

    ctx = SessionContext()
    ctx.from_pydict({"a": [1], "b": [2]}, "t_r3_stmt")
    for stmt in (
        "create index idx on t_r3_stmt (a)",
        "START TRANSACTION",
        "BEGIN",
        "COMMIT",
        "ROLLBACK WORK",
    ):
        assert ctx.sql(stmt).to_pylist() == []
    # DDL gating still applies to shimmed statements
    import pytest

    with pytest.raises(Exception):
        ctx.sql(
            "create index i2 on t_r3_stmt (b)",
            options=SQLOptions().with_allow_ddl(False),
        )


def test_expr_getitem_and_col_attr(spark):
    # ref tests/test_expr.py test_expr_getitem + test_col_getattr
    from datafusion_python_spark.api.context import SessionContext
    from datafusion_python_spark.api.expr import col

    ctx = SessionContext()
    data = {
        "array_values": [[1, 2, 3], [4, 5], [6], []],
        "struct_values": [
            {"name": "Alice", "age": 15},
            {"name": "Bob", "age": 14},
            {"name": "Charlie", "age": 13},
            {"name": None, "age": 12},
        ],
    }
    df = ctx.from_pydict(data, name="t_r3_getitem")
    names = [r["name"] for r in df.select(col("struct_values")["name"].alias("name")).to_pylist()]
    assert names == ["Alice", "Bob", "Charlie", None]
    # 0-based int indexing, NULL (not ANSI error) when out of range
    vals = [r["value"] for r in df.select(col("array_values")[1].alias("value")).to_pylist()]
    assert vals == [2, 5, None, None]
    # attribute syntax on the col/column helpers
    names2 = [r["name"] for r in df.select(col.struct_values["name"].alias("name")).to_pylist()]
    assert names2 == names


def test_unparse_select_one_all_dialects(spark):
    from datafusion_python_spark.api.context import SessionContext
    from datafusion_python_spark.api.substrait import Dialect, Unparser

    ctx = SessionContext()
    df = ctx.sql("SELECT 1")
    for dialect in (Dialect.mysql(), Dialect.postgres(), Dialect.sqlite(), Dialect.duckdb()):
        assert Unparser(dialect).plan_to_sql(df.logical_plan()) == "SELECT 1"


# --- pure-numpy JPEG/GIF codecs ---------------------------------------------


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 255 / (h + w))], axis=-1
    ).astype(np.uint8)


def test_jpeg_roundtrip_rgb():
    img = _gradient(40, 56)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    # smooth content at q95 round-trips within a few gray levels
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 4


def test_jpeg_roundtrip_gray_and_odd_size():
    g = _gradient(24, 24)[..., 0]
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (24, 24, 1)
    assert int(np.abs(dec[..., 0].astype(int) - g.astype(int)).max()) <= 3
    # non-multiple-of-8 dims crop correctly
    odd = _gradient(13, 21)
    assert decode_jpeg(encode_jpeg(odd)).shape == (13, 21, 3)


def test_jpeg_progressive_roundtrip():
    from datafusion_python_spark.operators.jpeg import encode_jpeg_progressive

    img = _gradient(40, 56)
    enc = encode_jpeg_progressive(img, quality=95)
    assert b"\xff\xc2" in enc  # SOF2 marker present
    dec = decode_jpeg(enc)
    # progressive decode reconstructs the SAME quantized coefficients as
    # baseline: outputs must be bit-identical, not merely close
    base = decode_jpeg(encode_jpeg(img, quality=95))
    assert (dec == base).all()
    # noise stresses EOB runs, ZRL-with-correction-bits, refinement
    rng = np.random.default_rng(5)
    n = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    assert (
        decode_jpeg(encode_jpeg_progressive(n, quality=75))
        == decode_jpeg(encode_jpeg(n, quality=75))
    ).all()
    # grayscale single-component scans
    g = _gradient(24, 24)[..., 0]
    decg = decode_jpeg(encode_jpeg_progressive(g, quality=90))
    assert decg.shape == (24, 24, 1)
    assert int(np.abs(decg[..., 0].astype(int) - g.astype(int)).max()) <= 3


def _png_chunk(ctype, body):
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _make_png(w, h, bit_depth, color_type, raw_rows, extra=b"", interlace=0):
    import struct
    import zlib

    from datafusion_python_spark.operators.codecs import PNG_MAGIC

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    return (
        PNG_MAGIC + _png_chunk(b"IHDR", ihdr) + extra
        + _png_chunk(b"IDAT", zlib.compress(raw_rows)) + _png_chunk(b"IEND", b"")
    )


def test_png_palette_trns_and_bit_depths():
    from datafusion_python_spark.operators.codecs import decode_png

    rng = np.random.default_rng(0)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (10, 13), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(10))
    png = _make_png(13, 10, 8, 3, raw, extra=_png_chunk(b"PLTE", pal.tobytes()))
    assert (decode_png(png) == pal[idx]).all()
    # tRNS → RGBA with per-index alpha
    png_t = _make_png(
        13, 10, 8, 3, raw,
        extra=_png_chunk(b"PLTE", pal.tobytes()) + _png_chunk(b"tRNS", bytes([10] * 8)),
    )
    dec = decode_png(png_t)
    assert dec.shape[2] == 4 and (dec[..., 3] == np.where(idx < 8, 10, 255)).all()
    # 16-bit RGB keeps the high byte
    img8 = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    img16 = (img8.astype(np.uint16) << 8) | 0x37
    raw16 = b"".join(b"\x00" + img16[y].astype(">u2").tobytes() for y in range(5))
    assert (decode_png(_make_png(4, 5, 16, 2, raw16)) == img8).all()
    # 1-bit grayscale scales to full range
    g1 = rng.integers(0, 2, (4, 11), dtype=np.uint8)
    raw1 = b"".join(b"\x00" + np.packbits(g1[y]).tobytes() for y in range(4))
    assert (decode_png(_make_png(11, 4, 1, 0, raw1))[..., 0] == g1 * 255).all()


def test_png_adam7_interlace():
    from datafusion_python_spark.operators.codecs import _ADAM7, decode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (11, 9, 3), dtype=np.uint8)
    passes = []
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size:
            passes.append(b"".join(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0])))
    png7 = _make_png(9, 11, 8, 2, b"".join(passes), interlace=1)
    assert (decode_png(png7) == img).all()


def test_gif_animation_frames():
    import struct

    from datafusion_python_spark.operators.codecs import (
        _lzw_encode,
        decode_gif_frames,
    )

    # 2-frame animation: full first frame, then a sub-rect patch with
    # transparency — frame 2 must compose over frame 1
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    f1 = np.ones((6, 8), np.uint8)  # all red
    patch = np.array([[2, 0], [0, 3]], np.uint8)  # green/transparent/blue (0=transparent)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 8, 6)
    out += bytes([0x80 | 0x11, 0, 0])  # GCT, 4 colors (size field 1)
    out += pal.tobytes()

    def frame(img, left, top, gce_transparent=None):
        b = bytearray()
        if gce_transparent is not None:
            b += bytes([0x21, 0xF9, 4, 0x05, 0, 0, gce_transparent, 0])  # keep + transp
        h, w = img.shape
        b += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + b"\x00"
        b += bytes([2])
        lzw = _lzw_encode(img.reshape(-1), 2)
        for i in range(0, len(lzw), 255):
            c = lzw[i : i + 255]
            b += bytes([len(c)]) + c
        b += b"\x00"
        return b

    out += frame(f1, 0, 0)
    out += frame(patch, 3, 2, gce_transparent=0)
    out += b"\x3b"
    frames = decode_gif_frames(bytes(out))
    assert len(frames) == 2
    assert (frames[0] == pal[1]).all()  # all red
    # frame 2: red canvas with green at (2,3), blue at (3,4); transparent holes stay red
    assert (frames[1][2, 3] == pal[2]).all()
    assert (frames[1][3, 4] == pal[3]).all()
    assert (frames[1][2, 4] == pal[1]).all() and (frames[1][3, 3] == pal[1]).all()


def test_gif_roundtrip_exact_palette():
    img = np.zeros((20, 30, 3), np.uint8)
    img[5:15, 10:20] = [255, 0, 0]
    img[0:5, :] = [0, 128, 255]
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_lzw_table_overflow():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, (120, 120), dtype=np.uint8)
    img = np.stack([idx] * 3, axis=-1)  # 256 colors → 12-bit table + clear codes
    assert (decode_gif(encode_gif(img)) == img).all()


def test_decode_image_dispatches_jpeg_and_gif():
    img = _gradient(16, 16)
    assert decode_image(encode_jpeg(img)).shape == (16, 16, 3)
    assert decode_image(encode_gif(img)).shape == (16, 16, 3)


def test_avi_mjpeg_roundtrip():
    from datafusion_python_spark.operators.video import (
        avi_frame_chunks,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        probe_avi,
    )

    frames = [np.roll(_gradient(24, 32), t * 3, axis=1) for t in range(6)]
    avi = encode_avi_mjpeg(frames, fps=5.0, quality=95)
    assert probe_avi(avi) == (32, 24, 6, 5.0)
    chunks = avi_frame_chunks(avi)
    assert len(chunks) == 6 and all(c[:2] == b"\xff\xd8" for c in chunks)
    dec = decode_avi_mjpeg(avi)
    assert len(dec) == 6 and dec[0].shape == (24, 32, 3)
    assert int(np.abs(dec[0].astype(int) - frames[0].astype(int)).max()) <= 4
    # selective decode only pays for sampled frames
    assert len(decode_avi_mjpeg(avi, [0, 3, 5])) == 3


def test_wav_encode_decode_roundtrip():
    from datafusion_python_spark.operators.codecs import decode_wav, encode_wav

    t = np.arange(4000)
    tone = (np.sin(2 * np.pi * 220 * t / 8000) * 12000).astype(np.int16)
    s, sr = decode_wav(encode_wav(tone, 8000))
    assert sr == 8000 and (s[:, 0] == tone).all()
    stereo = np.stack([tone, -tone], axis=1)
    s2, _ = decode_wav(encode_wav(stereo, 8000))
    assert (s2 == stereo).all()


def test_avi_audio_track_roundtrip():
    from datafusion_python_spark.operators.video import (
        decode_avi_audio,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    frames = [_gradient(16, 24)] * 5
    t = np.arange(8000)
    tone = (np.sin(2 * np.pi * 440 * t / 16000) * 10000).astype(np.int16)
    avi = encode_avi_mjpeg(frames, fps=10.0, audio=tone, sample_rate=16000)
    samples, sr = decode_avi_audio(avi)
    assert sr == 16000 and (samples[: 1600 * 5] == tone[: 1600 * 5]).all()
    assert len(decode_avi_mjpeg(avi)) == 5  # video stream unaffected
    import pytest

    with pytest.raises(ValueError):
        decode_avi_audio(encode_avi_mjpeg(frames[:2]))  # no audio stream


def test_mp4_mp3_probes():
    from datafusion_python_spark.operators.video import (
        make_mp3_probe_bytes,
        make_mp4_probe_bytes,
        probe_mp3,
        probe_mp4,
    )

    assert probe_mp4(make_mp4_probe_bytes(1920, 1080, 12.5)) == (1920, 1080, 12.5)
    mp3 = make_mp3_probe_bytes(128, 44100, n_frames=20)
    br, rate, dur = probe_mp3(mp3)
    assert (br, rate) == (128, 44100) and 0.4 < dur < 0.7
    # ID3v2 tag is skipped before sync search
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + bytes(10) + mp3
    assert probe_mp3(id3)[:2] == (128, 44100)


def test_probe_media_video_audio_formats(spark):
    from datafusion_python_spark.operators.multimodal import MEDIA_SCHEMA, probe_media
    from datafusion_python_spark.operators.video import (
        encode_avi_mjpeg,
        make_mp3_probe_bytes,
        make_mp4_probe_bytes,
    )

    avi = encode_avi_mjpeg([_gradient(16, 16)] * 4, fps=8.0)
    rows = [
        (0, "video", bytearray(avi), None),
        (1, "video", bytearray(make_mp4_probe_bytes(640, 480, 3.0)), None),
        (2, "audio", bytearray(make_mp3_probe_bytes(192, 48000)), None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in probe_media(df).collect()}
    assert (out[0]["format"], out[0]["width"], out[0]["height"], out[0]["n_samples"]) == (
        "avi", 16, 16, 4,
    )
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == ("mp4", 640, 480)
    assert (out[2]["format"], out[2]["sample_rate"]) == ("mp3", 48000)


def test_extract_frame_features_real_video(spark):
    from datafusion_python_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_frame_features,
    )
    from datafusion_python_spark.operators.video import encode_avi_mjpeg

    frames = [np.roll(_gradient(16, 24), t * 2, axis=0) for t in range(8)]
    avi = encode_avi_mjpeg(frames, fps=4.0, quality=95)
    rows = [
        (0, "video", bytearray(avi), None),
        (1, "video", bytearray(b"not a video"), None),  # drops, no failure
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_frame_features(df, every_n=3, dim=8).collect()
    got = sorted((r["media_id"], r["frame_no"]) for r in out)
    assert got == [(0, 0), (0, 3), (0, 6)]
    assert all(len(r["feature"]) == 8 for r in out)


def test_transcode_media_resize_and_convert(spark):
    from datafusion_python_spark.operators.codecs import decode_image, encode_png
    from datafusion_python_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        transcode_media,
    )

    big = _gradient(48, 64)
    rows = [
        (0, "image", bytearray(encode_png(big)), None),
        (1, "image", bytearray(encode_jpeg(big, quality=95)), None),
        (2, "image", bytearray(b"garbage"), None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in transcode_media(df, max_side=32, out_format="png").collect()}
    # 48x64 → scale by 2 → 24x32, re-encoded as PNG, decodable
    assert (out[0]["height"], out[0]["width"], out[0]["out_format"]) == (24, 32, "png")
    decoded = decode_image(bytes(out[0]["payload"]))
    assert decoded.shape == (24, 32, 3)
    # PNG source pixels survive the nearest-downscale + PNG round-trip exactly
    assert (decoded == big[::2, ::2]).all()
    assert out[1]["out_format"] == "png"
    assert out[2]["payload"] is None
    # jpeg output path
    outj = {r["media_id"]: r for r in transcode_media(df, max_side=32, out_format="jpeg").collect()}
    assert bytes(outj[0]["payload"])[:2] == b"\xff\xd8"


def test_extract_features_real_jpeg_gif(spark):
    from datafusion_python_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    img = _gradient(32, 32)
    rows = [
        (0, "image", bytearray(encode_jpeg(img)), None),
        (1, "image", bytearray(encode_gif(img)), None),
        (2, "image", bytearray(b"\xff\xd8\xffgarbage"), None),  # corrupt → null
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_features(df, dim=8, decoder="stdlib").collect()}
    assert out[0]["feature"] is not None and len(out[0]["feature"]) == 8
    assert out[1]["feature"] is not None and len(out[1]["feature"]) == 8
    assert out[2]["feature"] is None  # bad bytes never kill the task
    # JPEG and GIF encode the same image: features should be close
    a = np.array(out[0]["feature"])
    b = np.array(out[1]["feature"])
    assert float(np.abs(a - b).max()) < 0.2


# ---------------------------------------------------------------------------
# SemDeDup (operators/semdedup.py)
def test_semantic_dedup_matches_bruteforce(spark, sf_dir):
    """Survivors == brute-force evaluation of the SemDeDup rule (drop any
    row with a lower-id same-cluster neighbor at cosine >= t)."""
    import itertools

    import numpy as np

    from datafusion_python_spark.operators.semdedup import semantic_dedup
    from datafusion_python_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(emb, n_clusters=4, threshold=0.4)
    got = sorted(r["vec_id"] for r in out.select("vec_id").collect())

    cents = ivf_centroids(emb, 4)
    rows = ivf_assign(emb, cents).select("vec_id", "ivf_cell", "embedding").collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["ivf_cell"], []).append(
            (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        )
    dropped = set()
    for members in by_cell.values():
        members.sort()
        for (ia, va), (ib, vb) in itertools.combinations(members, 2):
            cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            if cos >= 0.4:
                dropped.add(ib)
    want = sorted(r["vec_id"] for r in rows if r["vec_id"] not in dropped)
    assert got == want
    assert len(dropped) > 0  # the threshold actually bites on this data


def test_semantic_dedup_plan_is_cluster_bounded(spark, sf_dir):
    """The pairwise stage must join on the cluster id — never a cartesian
    product — and assignment must stay a map-only codegen pass."""
    from datafusion_python_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(emb, n_clusters=4, threshold=0.4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan
