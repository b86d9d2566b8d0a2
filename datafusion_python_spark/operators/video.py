"""Pure-stdlib video/audio container handling: AVI-MJPEG decode for REAL,
MP4 and MP3 probing.

MJPEG-in-AVI is the one mainstream video format with no inter-frame
compression: the container is RIFF chunk walking and every frame is a
standalone baseline JPEG — which `operators/jpeg.py` decodes in pure
numpy. That makes the video pipeline (probe → frame-sample → per-frame
decode → features) REAL end to end in this codec-library-free container.
H.264/H.265/VP9 and MP3 audio *decode* remain documented
NotImplementedError (motion compensation / MDCT need native libs), but
their container metadata probes are plain byte math and implemented here.

A minimal AVI-MJPEG writer is included so decode is round-trip testable
with zero binary fixtures (same pattern as the PNG/GIF/JPEG codecs).
"""

from __future__ import annotations

import struct

import numpy as np


# --- AVI (RIFF) --------------------------------------------------------------


def probe_avi(data: bytes) -> tuple[int, int, int, float]:
    """(width, height, n_frames, fps) from the avih main header."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"LIST":
            ltype = data[pos + 8 : pos + 12]
            if ltype == b"hdrl":
                pos += 12  # descend
                continue
        if cid == b"avih":
            body = data[pos + 8 : pos + 8 + size]
            us_per_frame, _mbps, _pad, _flags, total_frames = struct.unpack(
                "<IIIII", body[:20]
            )
            width, height = struct.unpack("<II", body[32:40])
            fps = 1e6 / us_per_frame if us_per_frame else 0.0
            return width, height, total_frames, fps
        pos += 8 + size + (size & 1)
    raise ValueError("AVI has no avih header")


def avi_frame_chunks(data: bytes) -> list[bytes]:
    """Compressed frame payloads ('##dc'/'##db' chunks) from the movi list."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    pos = 12
    frames: list[bytes] = []
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"LIST":
            ltype = data[pos + 8 : pos + 12]
            if ltype == b"movi":
                end = pos + 8 + size
                p = pos + 12
                while p + 8 <= min(end, len(data)):
                    fid = data[p : p + 4]
                    (fsize,) = struct.unpack("<I", data[p + 4 : p + 8])
                    if fid[2:4] in (b"dc", b"db"):
                        frames.append(data[p + 8 : p + 8 + fsize])
                    p += 8 + fsize + (fsize & 1)
                return frames
            pos += 12
            continue
        pos += 8 + size + (size & 1)
    return frames


def decode_avi_mjpeg(
    data: bytes, frame_indices: list[int] | None = None
) -> list[np.ndarray]:
    """Decode selected frames of an MJPEG AVI → list of (H, W, 3) uint8.

    ``frame_indices=None`` decodes every frame; at corpus scale callers
    sample indices first (see multimodal.extract_frame_features) so only
    the kept frames pay the JPEG decode.
    """
    from datafusion_python_spark.operators.jpeg import decode_jpeg

    chunks = avi_frame_chunks(data)
    if frame_indices is None:
        frame_indices = list(range(len(chunks)))
    out = []
    for i in frame_indices:
        if 0 <= i < len(chunks) and chunks[i][:2] == b"\xff\xd8":
            out.append(decode_jpeg(chunks[i]))
    return out


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    fps: float = 10.0,
    quality: int = 90,
    audio: np.ndarray | None = None,
    sample_rate: int = 16000,
) -> bytes:
    """Minimal RIFF-AVI writer: each frame JPEG-compressed into a 00dc
    chunk; optional PCM16 mono ``audio`` becomes a second stream of
    per-frame-interleaved 01wb chunks."""
    from datafusion_python_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    us_per_frame = int(1e6 / fps)
    max_bytes = max(len(j) for j in jpegs)
    n_streams = 2 if audio is not None else 1

    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, max_bytes * int(fps), 0, 0x10, len(frames), 0, n_streams,
        max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0, 1, int(fps), 0, len(frames),
                      max_bytes, 0, -1, 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(body)) + ltype + body

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    audio_chunks: list[bytes] = []
    if audio is not None:
        pcm = np.asarray(audio, dtype=np.int16)
        spf = max(1, int(sample_rate / fps))  # samples per video frame
        strh_a = (
            b"auds" + b"\x00\x00\x00\x00"
            + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0, 1, sample_rate, 0,
                          len(pcm), spf * 2, 0, -1, 0, 0, 0, 0)
        )
        # WAVEFORMATEX: PCM, mono, 16-bit
        strf_a = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
        strl += lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a))
        for i in range(len(frames)):
            seg = pcm[i * spf : (i + 1) * spf]
            audio_chunks.append(chunk(b"01wb", seg.tobytes()))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(
        chunk(b"00dc", j) + (audio_chunks[i] if i < len(audio_chunks) else b"")
        for i, j in enumerate(jpegs)
    )
    movi = lst(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_audio(data: bytes) -> tuple[np.ndarray, int]:
    """PCM16 audio track of an AVI → (samples int16, sample_rate).

    Walks strl headers for the 'auds' stream's sample rate, then
    concatenates its '##wb' chunks from the movi list."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    sample_rate = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"LIST":
            ltype = data[pos + 8 : pos + 12]
            if ltype in (b"hdrl", b"strl"):
                pos += 12
                continue
            if ltype == b"movi":
                break
        if cid == b"strh" and data[pos + 8 : pos + 12] == b"auds":
            # rate field of the stream header (scale=1 → rate = samples/s)
            (sample_rate,) = struct.unpack("<I", data[pos + 8 + 24 : pos + 8 + 28])
        pos += 8 + size + (size & 1)
    if sample_rate is None:
        raise ValueError("AVI has no audio stream")
    chunks = []
    # reuse the movi walk, collecting '##wb' audio payloads
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"LIST" and data[pos + 8 : pos + 12] == b"movi":
            end = pos + 8 + size
            p = pos + 12
            while p + 8 <= min(end, len(data)):
                fid = data[p : p + 4]
                (fsize,) = struct.unpack("<I", data[p + 4 : p + 8])
                if fid[2:4] == b"wb":
                    chunks.append(data[p + 8 : p + 8 + fsize])
                p += 8 + fsize + (fsize & 1)
            break
        if cid == b"LIST":
            pos += 12
            continue
        pos += 8 + size + (size & 1)
    samples = np.frombuffer(b"".join(chunks), dtype=np.int16)
    return samples, sample_rate


# --- MP4 / ISO-BMFF probe ----------------------------------------------------


def probe_mp4(data: bytes) -> tuple[int, int, float]:
    """(width, height, duration_sec) from moov/mvhd + trak/tkhd box walk.

    Probe only — H.264/H.265 frame decode genuinely needs native codecs.
    """
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp)")

    def walk(start: int, end: int, path: tuple = ()):  # yields (type, body_start, body_end)
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", data[pos : pos + 4])
            btype = data[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
                hdr = 16
            elif size == 0:
                size = end - pos
            yield btype, pos + hdr, pos + size
            if btype in (b"moov", b"trak"):
                yield from walk(pos + hdr, pos + size)
            pos += size

    width = height = 0
    duration = 0.0
    for btype, b0, b1 in walk(0, len(data)):
        body = data[b0:b1]
        if btype == b"mvhd":
            ver = body[0]
            if ver == 1:
                timescale, dur = struct.unpack(">IQ", body[20:32])
            else:
                timescale, dur = struct.unpack(">II", body[12:20])
            duration = dur / timescale if timescale else 0.0
        elif btype == b"tkhd":
            ver = body[0]
            off = 76 if ver == 0 else 88  # 16.16-fixed width after the matrix
            wfx, hfx = struct.unpack(">II", body[off : off + 8])
            if wfx and hfx:
                width, height = wfx >> 16, hfx >> 16
    if not (width or height or duration):
        raise ValueError("MP4 has no moov metadata")
    return width, height, duration


def make_mp4_probe_bytes(width: int, height: int, duration_sec: float) -> bytes:
    """Minimal ftyp+moov(mvhd+trak/tkhd) container for probe tests."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    timescale = 1000
    mvhd = bytes(1) + bytes(3) + bytes(8) + struct.pack(
        ">II", timescale, int(duration_sec * timescale)
    ) + bytes(80)
    tkhd = bytes(4) + bytes(72) + struct.pack(">II", width << 16, height << 16)
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd)))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


# --- MP3 probe ---------------------------------------------------------------

_MP3_BITRATES = {  # kbps, MPEG1 Layer III
    1: 32, 2: 40, 3: 48, 4: 56, 5: 64, 6: 80, 7: 96,
    8: 112, 9: 128, 10: 160, 11: 192, 12: 224, 13: 256, 14: 320,
}
_MP3_RATES = {0: 44100, 1: 48000, 2: 32000}


def probe_mp3(data: bytes) -> tuple[int, int, float]:
    """(bitrate_kbps, sample_rate, est_duration_sec) from the first MPEG1
    Layer III frame header; duration estimated as CBR over payload size."""
    pos = 0
    if data[:3] == b"ID3":  # skip ID3v2 tag (syncsafe size)
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | (
            (data[8] & 0x7F) << 7
        ) | (data[9] & 0x7F)
        pos = 10 + size
    while pos + 4 <= len(data):
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            b1, b2 = data[pos + 1], data[pos + 2]
            version = (b1 >> 3) & 0x3  # 3 = MPEG1
            layer = (b1 >> 1) & 0x3  # 1 = Layer III
            br_idx = (b2 >> 4) & 0xF
            sr_idx = (b2 >> 2) & 0x3
            if version == 3 and layer == 1 and br_idx in _MP3_BITRATES and sr_idx in _MP3_RATES:
                bitrate = _MP3_BITRATES[br_idx]
                rate = _MP3_RATES[sr_idx]
                dur = (len(data) - pos) * 8 / (bitrate * 1000)
                return bitrate, rate, dur
        pos += 1
    raise ValueError("no MP3 frame sync found")


def make_mp3_probe_bytes(bitrate_kbps: int, sample_rate: int, n_frames: int = 10) -> bytes:
    """Valid-header MPEG1-L3 frames (silence payload) for probe tests."""
    br_idx = {v: k for k, v in _MP3_BITRATES.items()}[bitrate_kbps]
    sr_idx = {v: k for k, v in _MP3_RATES.items()}[sample_rate]
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00])
    frame = hdr + bytes(frame_len - 4)
    return frame * n_frames
