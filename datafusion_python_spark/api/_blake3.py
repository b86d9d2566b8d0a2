"""Pure-Python BLAKE3 (32-byte digest) for the digest('blake3') method.

The environment ships no native blake3 module, so the algorithm is
implemented from the public BLAKE3 specification (compression function,
chunk chaining, binary parent tree). Used through an Arrow-batched
pandas UDF — a documented slow path; installing the native ``blake3``
wheel (picked up automatically if importable) is the fast path.
"""

from __future__ import annotations

import struct

_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)
_CHUNK_START, _CHUNK_END, _PARENT, _ROOT = 1, 2, 4, 8
_MASK = 0xFFFFFFFF


def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & _MASK


def _g(s: list, a: int, b: int, c: int, d: int, mx: int, my: int) -> None:
    s[a] = (s[a] + s[b] + mx) & _MASK
    s[d] = _rotr(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & _MASK
    s[b] = _rotr(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b] + my) & _MASK
    s[d] = _rotr(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & _MASK
    s[b] = _rotr(s[b] ^ s[c], 7)


def _compress(h: tuple, m: tuple, t: int, blen: int, flags: int) -> list:
    s = [
        h[0], h[1], h[2], h[3], h[4], h[5], h[6], h[7],
        _IV[0], _IV[1], _IV[2], _IV[3],
        t & _MASK, (t >> 32) & _MASK, blen, flags,
    ]
    msg = list(m)
    for r in range(7):
        _g(s, 0, 4, 8, 12, msg[0], msg[1])
        _g(s, 1, 5, 9, 13, msg[2], msg[3])
        _g(s, 2, 6, 10, 14, msg[4], msg[5])
        _g(s, 3, 7, 11, 15, msg[6], msg[7])
        _g(s, 0, 5, 10, 15, msg[8], msg[9])
        _g(s, 1, 6, 11, 12, msg[10], msg[11])
        _g(s, 2, 7, 8, 13, msg[12], msg[13])
        _g(s, 3, 4, 9, 14, msg[14], msg[15])
        if r < 6:
            msg = [msg[i] for i in _PERM]
    return [s[i] ^ s[i + 8] for i in range(8)] + [
        (s[i + 8] ^ h[i]) & _MASK for i in range(8)
    ]


def _words(block: bytes) -> tuple:
    return struct.unpack("<16I", block.ljust(64, b"\x00"))


def _chunk_cv(chunk: bytes, counter: int) -> tuple:
    h = _IV
    blocks = [chunk[i: i + 64] for i in range(0, len(chunk), 64)] or [b""]
    for i, block in enumerate(blocks):
        flags = 0
        if i == 0:
            flags |= _CHUNK_START
        if i == len(blocks) - 1:
            flags |= _CHUNK_END
        h = tuple(_compress(h, _words(block), counter, len(block), flags)[:8])
    return h


def blake3(data: bytes) -> bytes:
    """32-byte BLAKE3 digest (hash mode, no key/derive)."""
    try:  # native module, if the environment ever provides one
        import blake3 as _native  # type: ignore

        return _native.blake3(data).digest()
    except Exception:
        pass
    chunks = [data[i: i + 1024] for i in range(0, len(data), 1024)] or [b""]
    if len(chunks) == 1:
        # single chunk: its last block is also the root
        h = _IV
        blocks = [chunks[0][i: i + 64] for i in range(0, len(chunks[0]), 64)] or [b""]
        for i, block in enumerate(blocks):
            flags = 0
            if i == 0:
                flags |= _CHUNK_START
            if i == len(blocks) - 1:
                flags |= _CHUNK_END | _ROOT
            out = _compress(h, _words(block), 0, len(block), flags)
            h = tuple(out[:8])
        return struct.pack("<8I", *h)
    # parent tree over chunk chaining values
    cvs = [_chunk_cv(c, i) for i, c in enumerate(chunks)]
    while len(cvs) > 2:
        nxt = []
        for i in range(0, len(cvs) - 1, 2):
            block = struct.pack("<8I", *cvs[i]) + struct.pack("<8I", *cvs[i + 1])
            nxt.append(tuple(_compress(_IV, _words(block), 0, 64, _PARENT)[:8]))
        if len(cvs) % 2:
            nxt.append(cvs[-1])
        cvs = nxt
    block = struct.pack("<8I", *cvs[0]) + struct.pack("<8I", *cvs[1])
    out = _compress(_IV, _words(block), 0, 64, _PARENT | _ROOT)
    return struct.pack("<8I", *out[:8])
