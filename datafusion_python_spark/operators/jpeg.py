"""Pure-numpy JPEG codec (no native codec libraries).

Closes the multimodal entropy-decode gap: this environment has no
libjpeg/PIL, so entropy-coded formats previously raised. Both baseline
sequential (SOF0/SOF1) and progressive (SOF2, T.81 Annex G: spectral
selection + successive approximation, EOB runs, restart intervals) decode
here — huffman entropy coding, 8x8 DCT, quantization, chroma subsampling
are all expressible in numpy. Only arithmetic-coded and hierarchical
variants still raise (vanishingly rare in real corpora).

Reference parity note: the reference engine has no image codecs at all;
this module backs the multimodal column operators (SURVEY.md pipeline
section), used from Arrow-batched mapInPandas in operators/multimodal.py.

Encoders for both modes (baseline 4:4:4; progressive with a
libjpeg-shaped scan script) exist so the decoders are round-trip
testable with zero external fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared tables -----------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K.1 example quantization tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis; FDCT = T @ B @ T.T, IDCT = T.T @ B @ T
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.25) if _k else np.sqrt(0.125)
        )


def _ycbcr_from_rgb(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _rgb_from_ycbcr(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --- huffman -----------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical mincode/maxcode/valptr decoder (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid huffman code in JPEG scan")


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None  # pending non-RST marker (end of scan)

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                # pad with 1s past the end (T.81 allows; EOB already emitted)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart markers are consumed by restart(), not here
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Align to byte boundary and consume an RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # skip FF Dn
            self.marker = None
            return
        # marker not buffered yet: scan forward
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# --- decoder -----------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline sequential JPEG → (H, W, 3) or (H, W, 1) uint8.

    Supports SOF0/SOF1, grayscale/YCbCr, any sampling (4:4:4/4:2:2/4:2:0),
    restart intervals, 8/16-bit DQT. Progressive (SOF2) raises.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (precision, H, W, comps) comps: (cid, h, v, tq)
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            precision = seg[0]
            h_img, w_img = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (precision, h_img, w_img, comps)
            if marker == 0xC2:
                return _decode_progressive(
                    data, pos + seglen, frame, qtables, huff_dc, huff_ac,
                    restart_interval,
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker {marker:#x} not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cs, tds = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cs] = (tds >> 4, tds & 0xF)
            return _decode_scan(
                data, pos + seglen, frame, scan_tables, qtables,
                huff_dc, huff_ac, restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG has no SOS marker")


def _decode_scan(data, scan_start, frame, scan_tables, qtables, huff_dc, huff_ac,
                 restart_interval):
    if frame is None:
        raise ValueError("JPEG SOS before SOF")
    _, h_img, w_img, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    # per-component block planes (MCU-padded)
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)

    reader = _BitReader(data, scan_start)
    dc_pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                dc_pred = {cid: 0 for cid, *_ in comps}
            for cid, ch, cv, tq in comps:
                td, ta = scan_tables[cid]
                q = qtables[tq]
                for by in range(cv):
                    for bx in range(ch):
                        coeffs = np.zeros(64, dtype=np.int32)
                        t = huff_dc[td].decode(reader)
                        diff = _extend(reader.receive(t), t) if t else 0
                        dc_pred[cid] += diff
                        coeffs[0] = dc_pred[cid]
                        k = 1
                        while k < 64:
                            rs = huff_ac[ta].decode(reader)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coeffs[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coeffs * q
                        b2 = _T.T @ block.reshape(8, 8) @ _T + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = b2
            mcu_count += 1

    # crop each component to its true size, upsample to image size
    out_planes = []
    for cid, ch, cv, _tq in comps:
        comp_h = -(-h_img * cv // vmax)
        comp_w = -(-w_img * ch // hmax)
        p = planes[cid][:comp_h, :comp_w]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:h_img, :w_img])
    if len(out_planes) == 1:
        return np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)[..., None]
    return _rgb_from_ycbcr(out_planes[0], out_planes[1], out_planes[2])


# --- progressive decoder (T.81 Annex G: spectral selection + successive
# approximation). Scans accumulate into per-component coefficient arrays;
# IDCT runs once at EOI. ---------------------------------------------------


def _decode_progressive(data, pos, frame, qtables, huff_dc, huff_ac,
                        restart_interval):
    _, h_img, w_img, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    geom = {}  # cid -> (h, v, tq, padded_bw, padded_bh, comp_bw, comp_bh)
    coefs = {}  # cid -> (padded_bh, padded_bw, 64) natural-order int32
    for cid, ch, cv, tq in comps:
        comp_w = -(-w_img * ch // hmax)
        comp_h = -(-h_img * cv // vmax)
        geom[cid] = (ch, cv, tq, mcus_x * ch, mcus_y * cv,
                     -(-comp_w // 8), -(-comp_h // 8))
        coefs[cid] = np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x00, 0x01) or 0xD0 <= marker <= 0xD8:
            continue  # stuffed FF00 / TEM / RSTn leftovers between scans
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    qtables[tq] = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int32)
                    i += 128
                else:
                    qtables[tq] = np.frombuffer(
                        seg[i : i + 64], dtype=np.uint8
                    ).astype(np.int32)
                    i += 64
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(
                    bits, list(seg[i + 17 : i + 17 + n])
                )
                i += 17 + n
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tds = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tds >> 4, tds & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            reader = _BitReader(data, pos + seglen)
            if ss == 0:
                _prog_dc_scan(reader, scan_comps, comps, geom, coefs,
                              huff_dc, ah, al, mcus_x, mcus_y,
                              restart_interval)
            else:
                cs, _td, ta = scan_comps[0]
                _prog_ac_scan(reader, cs, geom[cs], coefs[cs], huff_ac[ta],
                              ss, se, ah, al, restart_interval)
            pos = reader.pos
            continue
        pos += seglen

    # dequantize + IDCT + assemble (same layout logic as baseline)
    out_planes = []
    for cid, ch, cv, tq in comps:
        q = qtables[tq]
        qnat = np.empty(64, dtype=np.int64)
        qnat[ZIGZAG] = q  # DQT is zigzag-ordered; coefs are natural-order
        bh, bw = coefs[cid].shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                block = (coefs[cid][by, bx] * qnat).astype(np.float64)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _T.T @ block.reshape(8, 8) @ _T + 128.0
                )
        comp_h = -(-h_img * cv // vmax)
        comp_w = -(-w_img * ch // hmax)
        p = plane[:comp_h, :comp_w]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:h_img, :w_img])
    if len(out_planes) == 1:
        return np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)[..., None]
    return _rgb_from_ycbcr(out_planes[0], out_planes[1], out_planes[2])


def _prog_dc_scan(reader, scan_comps, comps, geom, coefs, huff_dc, ah, al,
                  mcus_x, mcus_y, restart_interval):
    tables = {cs: td for cs, td, _ta in scan_comps}
    in_scan = [c for c in comps if c[0] in tables]
    dc_pred = {cs: 0 for cs in tables}
    mcu_count = 0
    if len(in_scan) > 1:  # interleaved over the MCU grid
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    reader.restart()
                    dc_pred = {cs: 0 for cs in tables}
                for cid, ch, cv, _tq in in_scan:
                    for by in range(cv):
                        for bx in range(ch):
                            blk = coefs[cid][my * cv + by, mx * ch + bx]
                            _prog_dc_block(reader, blk, huff_dc, tables[cid],
                                           dc_pred, cid, ah, al)
                mcu_count += 1
        return
    cid, ch, cv, _tq = in_scan[0]
    _h, _v, _tq2, _pbw, _pbh, cbw, cbh = geom[cid]
    for by in range(cbh):
        for bx in range(cbw):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                dc_pred = {cs: 0 for cs in tables}
            _prog_dc_block(reader, coefs[cid][by, bx], huff_dc, tables[cid],
                           dc_pred, cid, ah, al)
            mcu_count += 1


def _prog_dc_block(reader, blk, huff_dc, td, dc_pred, cid, ah, al):
    if ah == 0:  # first DC scan: huffman-coded diffs at reduced precision
        t = huff_dc[td].decode(reader)
        diff = _extend(reader.receive(t), t) if t else 0
        dc_pred[cid] += diff
        blk[0] = dc_pred[cid] << al
    else:  # refinement: one raw bit per block
        if reader.read_bit():
            blk[0] |= 1 << al


def _prog_ac_scan(reader, cs, g, coef, ac, ss, se, ah, al, restart_interval):
    _h, _v, _tq, _pbw, _pbh, cbw, cbh = g
    eobrun = 0
    blocks_done = 0
    for by in range(cbh):
        for bx in range(cbw):
            if restart_interval and blocks_done and blocks_done % restart_interval == 0:
                reader.restart()
                eobrun = 0
            blk = coef[by, bx]
            if ah == 0:
                eobrun = _prog_ac_first(reader, blk, ac, ss, se, al, eobrun)
            else:
                eobrun = _prog_ac_refine(reader, blk, ac, ss, se, al, eobrun)
            blocks_done += 1


def _prog_ac_first(reader, blk, ac, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac.decode(reader)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) + (reader.receive(r) if r else 0) - 1
            break
        k += r
        if k > se:
            raise ValueError("progressive AC run past band end")
        blk[ZIGZAG[k]] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _prog_ac_refine(reader, blk, ac, ss, se, al, eobrun):
    """T.81 G.2 / the standard AC successive-approximation refinement."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac.decode(reader)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (reader.receive(r) if r else 0)
                    break
                val = 0  # ZRL: pass 16 zero-history coefficients
            else:
                # newly-significant coefficient is +-1 at this precision
                val = p1 if reader.read_bit() else m1
            while k <= se:
                c = blk[ZIGZAG[k]]
                if c != 0:  # previously significant: correction bit
                    if reader.read_bit() and (c & p1) == 0:
                        blk[ZIGZAG[k]] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0 and k <= se:
                blk[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB: refine the rest of this block
            c = blk[ZIGZAG[k]]
            if c != 0 and reader.read_bit() and (c & p1) == 0:
                blk[ZIGZAG[k]] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


# --- encoder -----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(writer, coeffs_zz, dc_pred, dc_codes, ac_codes) -> int:
    dc = int(coeffs_zz[0])
    diff = dc - dc_pred
    t = _category(diff)
    code, ln = dc_codes[t]
    writer.write(code, ln)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    # AC
    run = 0
    last_nz = 0
    nz = np.nonzero(coeffs_zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, 64):
        v = int(coeffs_zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return dc


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode (H, W, 3) or (H, W) / (H, W, 1) uint8 → baseline 4:4:4 JPEG."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    h, w, nc = img.shape
    if nc == 1:
        planes = [img[..., 0].astype(np.float64)]
    elif nc == 3:
        ycc = _ycbcr_from_rgb(img.astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        raise ValueError("encode_jpeg expects 1 or 3 channels")

    qluma = _scale_quant(QUANT_LUMA, quality)
    qchroma = _scale_quant(QUANT_CHROMA, quality)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (tables stored in zigzag order per T.81 B.2.4.1)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0]) + bytes(qluma[ZIGZAG].tolist())
    if nc == 3:
        out += (
            b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([1]) + bytes(qchroma[ZIGZAG].tolist())
        )
    # SOF0
    comps = [(1, 0x11, 0)] + ([(2, 0x11, 1), (3, 0x11, 1)] if nc == 3 else [])
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    def dht(tc, th, bits, vals):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if nc == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    # SOS
    sos = bytes([len(comps)])
    for cid, _hv, tq in comps:
        sos += bytes([cid, (tq << 4) | tq])  # DC/AC table = component's tq slot
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_luma_codes = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_luma_codes = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_chroma_codes = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_chroma_codes = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    ph = -(-h // 8) * 8
    pw = -(-w // 8) * 8
    writer = _BitWriter()
    dc_pred = [0] * len(planes)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, plane in enumerate(planes):
                q = qluma if ci == 0 else qchroma
                dc_codes = dc_luma_codes if ci == 0 else dc_chroma_codes
                ac_codes = ac_luma_codes if ci == 0 else ac_chroma_codes
                # edge-replicated 8x8 block
                ys = np.minimum(np.arange(by * 8, by * 8 + 8), h - 1)
                xs = np.minimum(np.arange(bx * 8, bx * 8 + 8), w - 1)
                block = plane[np.ix_(ys, xs)] - 128.0
                coeffs = _T @ block @ _T.T
                zz = np.round(coeffs.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(np.int32)
                dc_pred[ci] = _encode_block(writer, zz, dc_pred[ci], dc_codes, ac_codes)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder (spectral selection + successive approximation) ----
# Exists so the progressive decoder is round-trip testable with zero binary
# fixtures: DC at Al=1 then a DC refinement pass, and per component an AC
# first scan at Al=1 followed by an AC refinement scan — the same scan
# script shape libjpeg emits, exercising EOB runs, ZRL-with-correction-bits
# and newly-significant coefficient insertion. 4:4:4 / grayscale only.


def _shift_tz(v: int, al: int) -> int:
    """AC point transform: v / 2^al rounded toward zero (T.81 G.1.2.2)."""
    a = abs(int(v)) >> al
    return a if v >= 0 else -a


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90) -> bytes:
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    h, w, nc = img.shape
    if nc == 1:
        planes = [img[..., 0].astype(np.float64)]
    elif nc == 3:
        ycc = _ycbcr_from_rgb(img.astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        raise ValueError("encode_jpeg_progressive expects 1 or 3 channels")

    qluma = _scale_quant(QUANT_LUMA, quality)
    qchroma = _scale_quant(QUANT_CHROMA, quality)
    nby = -(-h // 8)
    nbx = -(-w // 8)
    comps_coef = []
    for ci, plane in enumerate(planes):
        q = qluma if ci == 0 else qchroma
        arr = np.zeros((nby, nbx, 64), np.int32)
        for by in range(nby):
            for bx in range(nbx):
                ys = np.minimum(np.arange(by * 8, by * 8 + 8), h - 1)
                xs = np.minimum(np.arange(bx * 8, bx * 8 + 8), w - 1)
                block = plane[np.ix_(ys, xs)] - 128.0
                coeffs = _T @ block @ _T.T
                arr[by, bx] = np.round(
                    coeffs.reshape(64)[ZIGZAG] / q[ZIGZAG]
                ).astype(np.int32)
        comps_coef.append(arr)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0]) + bytes(qluma[ZIGZAG].tolist())
    if nc == 3:
        out += (
            b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([1]) + bytes(qchroma[ZIGZAG].tolist())
        )
    comps = [(1, 0x11, 0)] + ([(2, 0x11, 1), (3, 0x11, 1)] if nc == 3 else [])
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    def dht(tc, th, bits, vals):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if nc == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    dc_codes = [
        _build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_codes = [
        _build_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    def sos(specs, ss, se, ah, al) -> bytes:
        body = bytes([len(specs)])
        for cid, td, ta in specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    # scan 1: DC first, Al=1, interleaved over all components
    wtr = _BitWriter()
    pred = [0] * nc
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(nc):
                dc = int(comps_coef[ci][by, bx, 0]) >> 1  # arithmetic shift
                diff = dc - pred[ci]
                pred[ci] = dc
                t = _category(diff)
                code, ln = dc_codes[min(ci, 1)][t]
                wtr.write(code, ln)
                if t:
                    wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    wtr.flush()
    out += sos([(comps[ci][0], min(ci, 1), 0) for ci in range(nc)], 0, 0, 0, 1)
    out += wtr.out

    # scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block
    wtr = _BitWriter()
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(nc):
                wtr.write(int(comps_coef[ci][by, bx, 0]) & 1, 1)
    wtr.flush()
    out += sos([(comps[ci][0], min(ci, 1), 0) for ci in range(nc)], 0, 0, 1, 0)
    out += wtr.out

    # per component: AC first scan (Al=1) then AC refinement (Ah=1 → Al=0)
    for ci in range(nc):
        codes = ac_codes[min(ci, 1)]
        coef = comps_coef[ci]

        wtr = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                block = coef[by, bx]
                shifted = [_shift_tz(block[k], 1) for k in range(64)]
                last = 0
                for k in range(1, 64):
                    if shifted[k]:
                        last = k
                run = 0
                for k in range(1, last + 1):
                    v = shifted[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = codes[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = codes[(run << 4) | s]
                    wtr.write(code, ln)
                    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    code, ln = codes[0x00]  # EOB (this block only)
                    wtr.write(code, ln)
        wtr.flush()
        out += sos([(comps[ci][0], 0, min(ci, 1))], 1, 63, 0, 1)
        out += wtr.out

        wtr = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                block = coef[by, bx]
                r = 0
                pending: list[int] = []
                for k in range(1, 64):
                    v = int(block[k])
                    absn = abs(v)
                    if absn == 0:
                        r += 1
                        continue
                    # flush ZRLs at EVERY nonzero coefficient (sig or new)
                    # BEFORE buffering its bit — correction-bit order must
                    # match the decoder's walk exactly
                    while r > 15:
                        code, ln = codes[0xF0]
                        wtr.write(code, ln)
                        for b in pending:
                            wtr.write(b, 1)
                        pending = []
                        r -= 16
                    if absn > 1:  # previously significant: correction bit
                        pending.append(absn & 1)
                        continue
                    # newly significant at this precision
                    code, ln = codes[(r << 4) | 1]
                    wtr.write(code, ln)
                    wtr.write(1 if v > 0 else 0, 1)
                    for b in pending:
                        wtr.write(b, 1)
                    pending = []
                    r = 0
                if r > 0 or pending:
                    code, ln = codes[0x00]  # EOB (eobrun = 1)
                    wtr.write(code, ln)
                    for b in pending:
                        wtr.write(b, 1)
        wtr.flush()
        out += sos([(comps[ci][0], 0, min(ci, 1))], 1, 63, 1, 0)
        out += wtr.out

    out += b"\xff\xd9"
    return bytes(out)
