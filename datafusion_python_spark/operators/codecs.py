"""Pure-stdlib media codecs: PNG, BMP, WAV decode without PIL/ffmpeg.

The container has no imaging libraries, but every common test format
decodes with nothing beyond numpy and the standard library: PNG is zlib
inflate + five defined row filters, BMP is raw bytes, GIF is full
variable-width LZW, JPEG (baseline + progressive) lives in
``operators/jpeg.py``, and WAV PCM parses with ``wave``. These are REAL
decoders — bit-exact pixels/samples where the format is lossless — not
stubs; only MP3 audio and inter-frame video codecs remain documented
NotImplementedError (MDCT/motion compensation genuinely need native
libs).

They exist so the multimodal pipeline (`operators/multimodal.py`) can
run decode → feature-extract → resize end-to-end on real bytes inside
``mapInPandas``. Throughput note: the unfilter loop is per-row Python —
fine for the Arrow-batched feature path on thumbnails/test assets; a
production deployment swaps `decode_image` for a native decoder with
the same (H, W, C) uint8 contract and nothing else changes.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Adam7 pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, off: int, w_px: int, h_px: int, channels: int,
                  bit_depth: int) -> tuple[np.ndarray, int]:
    """Undo the five PNG row filters for one (sub-)image → ((h, stride)
    uint8 byte matrix, bytes consumed)."""
    if bit_depth >= 8:
        bpp = channels * (bit_depth // 8)
        stride = w_px * bpp
    else:
        bpp = 1
        stride = (w_px * channels * bit_depth + 7) // 8
    out = np.zeros((h_px, stride), dtype=np.uint8)
    for y in range(h_px):
        base = off + y * (stride + 1)
        ftype = raw[base]
        row = bytearray(raw[base + 1 : base + 1 + stride])
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            row = bytearray(
                (np.frombuffer(bytes(row), np.uint8) + prev).astype(np.uint8).tobytes()
            )
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (row[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), np.uint8)
    return out, (stride + 1) * h_px


def _png_samples(bytes2d: np.ndarray, w_px: int, channels: int,
                 bit_depth: int) -> np.ndarray:
    """(h, stride) filtered bytes → (h, w_px, channels) raw samples.
    16-bit samples keep their high byte (8-bit output contract)."""
    h = bytes2d.shape[0]
    if bit_depth == 16:
        return bytes2d.reshape(h, -1)[:, 0 : w_px * channels * 2 : 2].reshape(
            h, w_px, channels
        )
    if bit_depth == 8:
        return bytes2d.reshape(h, w_px, channels)
    bits = np.unpackbits(bytes2d, axis=1)
    n = w_px * channels
    vals = np.zeros((h, n), dtype=np.uint8)
    for b in range(bit_depth):
        vals = (vals << 1) | bits[:, b::bit_depth][:, :n]
    return vals.reshape(h, w_px, channels)


def decode_png(data: bytes) -> np.ndarray:
    """PNG → (H, W, C) uint8. Supports gray/RGB/RGBA/gray+alpha and
    palette (PLTE, with tRNS → RGBA), bit depths 1/2/4/8/16 (16-bit
    keeps the high byte), all five row filters, and Adam7 interlace."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    plte = None
    trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"PNG bit depth {bit_depth}")
    raw = zlib.decompress(bytes(idat))

    if interlace:  # Adam7: seven independently-filtered sub-images
        img = np.zeros((height, width, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            block, used = _png_unfilter(raw, off, pw, ph, channels, bit_depth)
            off += used
            img[y0::dy, x0::dx] = _png_samples(block, pw, channels, bit_depth)
    else:
        block, _used = _png_unfilter(raw, 0, width, height, channels, bit_depth)
        img = _png_samples(block, width, channels, bit_depth)

    if color_type == 3:  # palette indices → RGB(A)
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[..., 0]
        rgb = plte[np.minimum(idx, len(plte) - 1)]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[np.minimum(idx, len(plte) - 1)]])
        return rgb
    if color_type == 0 and bit_depth < 8:  # scale gray to full range
        img = (img.astype(np.uint16) * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 rows) — the test-fixture twin of
    :func:`decode_png`, also handy for writing thumbnails back out."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BITMAPINFOHEADER BMP → (H, W, 3) uint8 (RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    flipped = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3  # 4-byte row alignment
    out = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        row = data[pixel_off + y * row_size : pixel_off + y * row_size + width * 3]
        arr = np.frombuffer(row, np.uint8).reshape(width, 3)[:, ::-1]  # BGR→RGB
        out[height - 1 - y if flipped else y] = arr
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a first frame → (H, W, 3) uint8 via full LZW decode.

    Supports global/local color tables, interlace, and skips 89a
    extension blocks. Animation: returns the first image descriptor
    (frame extraction for later frames is the same loop).
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos]:
                pos += data[pos] + 1
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            iflags = data[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code = data[pos]
            pos += 1
            chunks = []
            while data[pos]:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += ln + 1
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, iw * ih)
            px = np.array(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                out_rows = np.empty(ih, dtype=np.int64)
                order = np.concatenate(
                    [np.arange(0, ih, 8), np.arange(4, ih, 8),
                     np.arange(2, ih, 4), np.arange(1, ih, 2)]
                )
                out_rows[order] = np.arange(len(order))
                px = px[out_rows]
            return ct[np.clip(px, 0, len(ct) - 1)]
        elif block == 0x3B:  # trailer
            break
        else:
            pos += 1
    raise ValueError("GIF has no image data")


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """Animated GIF → list of composed (H, W, 3) uint8 frames.

    Applies graphic-control-extension transparency and disposal methods
    (1 keep, 2 restore-background, 3 restore-previous) so each returned
    frame is the full composed canvas — the input contract for
    video-style frame sampling over GIF payloads.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", data[6:10])
    flags = data[10]
    bg_idx = data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    bg = gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg, (height, width, 3)).copy()
    frames: list[np.ndarray] = []
    transparent = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        if block == 0x21:
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control extension
                gflags = data[pos + 1]
                disposal = (gflags >> 2) & 0x7
                transparent = data[pos + 4] if gflags & 1 else None
            while data[pos]:
                pos += data[pos] + 1
            pos += 1
        elif block == 0x2C:
            left, top, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            iflags = data[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code = data[pos]
            pos += 1
            chunks = []
            while data[pos]:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += ln + 1
            pos += 1
            idx = np.array(
                _lzw_decode(b"".join(chunks), min_code, iw * ih)[: iw * ih],
                dtype=np.int32,
            ).reshape(ih, iw)
            if iflags & 0x40:
                order = np.concatenate(
                    [np.arange(0, ih, 8), np.arange(4, ih, 8),
                     np.arange(2, ih, 4), np.arange(1, ih, 2)]
                )
                inv = np.empty(ih, dtype=np.int64)
                inv[order] = np.arange(len(order))
                idx = idx[inv]
            prev = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + ih, left : left + iw]
            px = ct[np.clip(idx, 0, len(ct) - 1)]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = px[mask]
            else:
                region[...] = px
            frames.append(canvas.copy())
            if disposal == 2:  # restore background in the frame rect
                canvas[top : top + ih, left : left + iw] = bg
            elif disposal == 3 and prev is not None:
                canvas = prev
            disposal = 0
            transparent = None
        elif block == 0x3B:
            break
        else:
            pos += 1
    return frames


def _lzw_decode(data: bytes, min_code_size: int, limit: int) -> list[int]:
    """GIF-variant LZW (LSB-first variable-width codes, max 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < limit:
        while nbits < code_size:
            if pos >= len(data):
                return out
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (dict-based, emits clear at table fill)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    w = b""
    for v in indices.astype(np.uint8).tobytes():
        wk = w + bytes([v])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << code_size):
            if code_size < 12:
                code_size += 1
            else:
                emit(clear, code_size)
                table = {bytes([i]): i for i in range(clear)}
                next_code = end + 1
                code_size = min_code_size + 1
        w = bytes([v])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → single-frame GIF89a with an adaptive palette.

    Palette = unique colors if ≤256, else a 6x7x6 uniform quantization.
    Exists so decode_gif is round-trip testable with zero fixtures.
    """
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        q = (flat[:, 0] // 43) * 42 + (flat[:, 1] // 37) * 6 + flat[:, 2] // 43
        colors, inverse = np.unique(q, return_inverse=True)
        palette = np.stack(
            [(colors // 42) * 43, ((colors % 42) // 6) * 37, (colors % 6) * 43], axis=1
        ).astype(np.uint8)
    else:
        palette = colors.astype(np.uint8)
    bits = max(1, int(len(palette) - 1).bit_length())
    n = 1 << bits
    pal = np.zeros((n, 3), np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code = max(2, bits)
    out += bytes([min_code])
    lzw = _lzw_encode(inverse.astype(np.uint8), min_code)
    for i in range(0, len(lzw), 255):
        chunk_bytes = lzw[i : i + 255]
        out += bytes([len(chunk_bytes)]) + chunk_bytes
    out += b"\x00\x3b"
    return bytes(out)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM → (samples[n, channels] int16/int32-scaled, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        frames = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise NotImplementedError(f"WAV sample width {sw}")
    arr = np.frombuffer(frames, dtype).reshape(-1, ch)
    return arr, sr


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) or (n,) int16 PCM → WAV bytes (twin of decode_wav,
    for writing processed audio back out)."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def resize_nearest(img: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor downscale keeping aspect; no-op if already small."""
    h, w = img.shape[:2]
    scale = max(h, w) / max_side
    if scale <= 1:
        return img
    nh, nw = max(1, int(round(h / scale))), max(1, int(round(w / scale)))
    ys = (np.arange(nh) * (h / nh)).astype(int).clip(0, h - 1)
    xs = (np.arange(nw) * (w / nw)).astype(int).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray, dim: int = 16) -> list[float]:
    """Real pixel features: per-channel mean/std + a luminance histogram,
    padded/truncated to ``dim`` and unit-normalized."""
    f = img.astype(np.float64) / 255.0
    if f.ndim == 2:
        f = f[:, :, None]
    feats = []
    for c in range(f.shape[2]):
        feats += [float(f[:, :, c].mean()), float(f[:, :, c].std())]
    lum = f.mean(axis=2)
    hist, _ = np.histogram(lum, bins=max(1, dim - len(feats)), range=(0, 1))
    total = hist.sum() or 1
    feats += (hist / total).tolist()
    feats = (feats + [0.0] * dim)[:dim]
    nrm = float(np.sqrt(sum(v * v for v in feats))) or 1.0
    return [v / nrm for v in feats]


def audio_features(samples: np.ndarray, sr: int, dim: int = 16) -> list[float]:
    """Real signal features: RMS, zero-crossing rate, and FFT band
    energies, unit-normalized to ``dim``."""
    x = samples.astype(np.float64).mean(axis=1)  # mixdown
    peak = np.abs(x).max() or 1.0
    x = x / peak
    rms = float(np.sqrt((x**2).mean())) if len(x) else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    n_bands = max(1, dim - 2)
    bands = np.array_split(spec, n_bands)
    energy = [float(np.sqrt((b**2).mean())) if len(b) else 0.0 for b in bands]
    total = sum(energy) or 1.0
    feats = ([rms, zcr] + [e / total for e in energy] + [0.0] * dim)[:dim]
    nrm = float(np.sqrt(sum(v * v for v in feats))) or 1.0
    return [v / nrm for v in feats]


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode: PNG, BMP, GIF, or baseline JPEG → (H, W, C) uint8.

    All four are pure numpy/stdlib decoders — no native codec libraries;
    JPEG covers baseline and progressive (see operators/jpeg.py)."""
    if data.startswith(PNG_MAGIC):
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:3] == b"\xff\xd8\xff":
        from datafusion_python_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:4] in (b"GIF8",):
        return decode_gif(data)
    raise ValueError("unrecognized image format")
