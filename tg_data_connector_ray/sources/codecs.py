"""Compression codecs for the unstructured-storage read path.

The reference reads lzo / lzo_deflate / hadoop-snappy / framing-snappy
text exports via airlift + anarres-lzo streams (study citation:
plugin-unstructured-storage-util/.../UnstructuredStorageReaderUtil.java:
117-213, ExpandLzopInputStream.java — semantics studied, nothing ported).
This module reimplements those stream formats from their PUBLIC format
specifications:

- snappy block format   (google/snappy format_description.txt)
- hadoop-snappy         (Hadoop BlockCompressorStream framing: 4-byte BE
                         uncompressed block length, then <4-byte BE chunk
                         length><snappy chunk> until the block is full)
- framing-snappy        (snappy framing format RFC: typed chunks with
                         masked CRC-32C)
- lzo1x stream          (Linux Documentation/lzo.txt instruction set)
- lzo_deflate           (anarres LzoInputStream block framing: <4-byte BE
                         uncompressed len><4-byte BE compressed len><data>)
- lzo (lzop container)  (lzop file format: magic + header + checksummed
                         blocks)

Native libraries are used when importable (python-snappy / python-lzo);
otherwise the pure-Python decoders below run.  They are correctness-first
(~10-50 MB/s/task): right for verifying semantics and for the long tail
of small files, while a real deployment installs the native wheels and
gets them picked up automatically by the same entry points.

Compressors here exist to produce VALID streams for round-trip tests and
the file sink; they emit literal runs only (no match search), which every
conformant decoder must accept.
"""

from __future__ import annotations

import struct
import zlib

# --- optional native accelerators -----------------------------------------
try:  # pragma: no cover - not installed in this sandbox
    import snappy as _native_snappy  # python-snappy
except Exception:  # pragma: no cover
    _native_snappy = None
try:  # pragma: no cover
    import lzo as _native_lzo  # python-lzo
except Exception:  # pragma: no cover
    _native_lzo = None


# ---------------------------------------------------------------------------
# snappy block format

def _uvarint(buf: bytes, pos: int) -> "tuple[int, int]":
    shift = val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _uvarint_bytes(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def snappy_uncompress(data: bytes) -> bytes:
    """Raw snappy block -> bytes (format_description.txt §2)."""
    if _native_snappy is not None:  # pragma: no cover
        return _native_snappy.uncompress(data)
    total, pos = _uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63 -> 1..4 extra little-endian length bytes
                extra = ln - 59
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = 4 + ((tag >> 2) & 0x7)
            off = ((tag & 0xE0) << 3) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = 1 + (tag >> 2)
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = 1 + (tag >> 2)
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: bad copy offset")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # overlapping copy = run repeat, byte semantics
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != total:
        raise ValueError(f"snappy: length mismatch {len(out)} != {total}")
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Minimal VALID snappy block: literal elements only."""
    if _native_snappy is not None:  # pragma: no cover
        return _native_snappy.compress(data)
    out = bytearray(_uvarint_bytes(len(data)))
    pos, n = 0, len(data)
    while pos < n:
        chunk = min(n - pos, 1 << 20)
        ln = chunk - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < (1 << 8):
            out.append(60 << 2)
            out += ln.to_bytes(1, "little")
        elif ln < (1 << 16):
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += ln.to_bytes(3, "little")
        out += data[pos : pos + chunk]
        pos += chunk
    return bytes(out)


# ---------------------------------------------------------------------------
# hadoop-snappy (Hadoop BlockCompressorStream framing)

_HADOOP_BLOCK = 256 * 1024


def hadoop_snappy_uncompress(data: bytes, limit: "int | None" = None) -> bytes:
    """`limit`: stop after at least this many OUTPUT bytes (frame-aligned)
    — lets a sniffer decode a prefix instead of a multi-GB whole file."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        if limit is not None and len(out) >= limit:
            break
        (block_len,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        got = 0
        while got < block_len:
            (chunk_len,) = struct.unpack(">I", data[pos : pos + 4])
            pos += 4
            piece = snappy_uncompress(data[pos : pos + chunk_len])
            pos += chunk_len
            out += piece
            got += len(piece)
        if got != block_len:
            raise ValueError("hadoop-snappy: block length mismatch")
    return bytes(out)


def hadoop_snappy_compress(data: bytes, block_size: int = _HADOOP_BLOCK) -> bytes:
    # empty input -> empty stream (Hadoop's BlockCompressorStream emits no
    # frame for zero bytes; a 0-length frame would still carry chunk
    # headers the reader must not expect)
    out = bytearray()
    for pos in range(0, len(data), block_size):
        block = data[pos : pos + block_size]
        comp = snappy_compress(block)
        out += struct.pack(">I", len(block))
        out += struct.pack(">I", len(comp))
        out += comp
    return bytes(out)


# ---------------------------------------------------------------------------
# framing-snappy (snappy framing format)

_CRC32C_TABLE = None


def _crc32c(data: bytes) -> int:
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        poly = 0x82F63B78  # reflected Castagnoli
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    crc = 0xFFFFFFFF
    tbl = _CRC32C_TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc32c(data: bytes) -> int:
    c = _crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"


def framing_snappy_uncompress(data: bytes, verify_checksums: bool = True,
                              limit: "int | None" = None) -> bytes:
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        if limit is not None and len(out) >= limit:
            break
        kind = data[pos]
        ln = int.from_bytes(data[pos + 1 : pos + 4], "little")
        pos += 4
        payload = data[pos : pos + ln]
        pos += ln
        if kind == 0xFF:  # stream identifier
            if payload != b"sNaPpY":
                raise ValueError("framing-snappy: bad stream identifier")
        elif kind == 0x00:  # compressed data
            crc = int.from_bytes(payload[:4], "little")
            piece = snappy_uncompress(payload[4:])
            if verify_checksums and _masked_crc32c(piece) != crc:
                raise ValueError("framing-snappy: CRC mismatch")
            out += piece
        elif kind == 0x01:  # uncompressed data
            crc = int.from_bytes(payload[:4], "little")
            piece = payload[4:]
            if verify_checksums and _masked_crc32c(piece) != crc:
                raise ValueError("framing-snappy: CRC mismatch")
            out += piece
        elif 0x02 <= kind <= 0x7F:
            raise ValueError(f"framing-snappy: unskippable chunk 0x{kind:02x}")
        # 0x80..0xfe: skippable, ignore
    return bytes(out)


def framing_snappy_compress(data: bytes, block_size: int = 65536) -> bytes:
    out = bytearray(_STREAM_ID)
    for pos in range(0, len(data), block_size):
        block = data[pos : pos + block_size]
        comp = snappy_compress(block)
        crc = _masked_crc32c(block).to_bytes(4, "little")
        if len(comp) < len(block):
            payload = crc + comp
            out += bytes([0x00]) + len(payload).to_bytes(3, "little") + payload
        else:
            payload = crc + block
            out += bytes([0x01]) + len(payload).to_bytes(3, "little") + payload
    return bytes(out)


# ---------------------------------------------------------------------------
# LZO1X stream (Documentation/lzo.txt instruction set)

def lzo1x_decompress(data: bytes, expected_len: "int | None" = None) -> bytes:
    """LZO1X compressed stream -> bytes (safe: bounds-checked)."""
    if _native_lzo is not None and expected_len is not None:  # pragma: no cover
        return _native_lzo.decompress(data, False, expected_len)
    out = bytearray()
    pos, n = 0, len(data)

    def take_ext(base: int) -> int:
        # extended length: (zero bytes)*255 + first nonzero + base
        nonlocal pos
        length = base
        while data[pos] == 0:
            length += 255
            pos += 1
        length += data[pos]
        pos += 1
        return length

    def copy_match(dist: int, length: int):
        if dist <= 0 or dist > len(out):
            raise ValueError("lzo1x: bad match distance")
        start = len(out) - dist
        if dist >= length:
            out.extend(out[start : start + length])
        else:
            for i in range(length):
                out.append(out[start + i])

    state = 0
    t = data[pos]
    pos += 1
    if t >= 18:  # first-byte literal-run special case
        ln = t - 17
        out += data[pos : pos + ln]
        pos += ln
        state = 4 if ln >= 4 else ln
        t = data[pos]
        pos += 1
    while True:
        if t <= 15:
            if state == 0:  # long literal run
                ln = take_ext(18) if t == 0 else t + 3
                out += data[pos : pos + ln]
                pos += ln
                state = 4
            elif state < 4:  # 2-byte match, distance <= 1024
                h = data[pos]
                pos += 1
                copy_match((h << 2) + (t >> 2) + 1, 2)
                state = t & 3
                out += data[pos : pos + state]
                pos += state
            else:  # state == 4: 3-byte match, distance 2049..3072
                h = data[pos]
                pos += 1
                copy_match((h << 2) + (t >> 2) + 2049, 3)
                state = t & 3
                out += data[pos : pos + state]
                pos += state
        elif t <= 31:  # M4: far/long match
            ln = take_ext(9) if (t & 7) == 0 else (t & 7) + 2
            le = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
            dist = 16384 + ((t & 8) << 11) + (le >> 2)
            state = le & 3
            if dist == 16384:  # end-of-stream marker
                break
            copy_match(dist, ln)
            out += data[pos : pos + state]
            pos += state
        elif t <= 63:  # M3
            ln = take_ext(33) if (t & 31) == 0 else (t & 31) + 2
            le = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
            copy_match((le >> 2) + 1, ln)
            state = le & 3
            out += data[pos : pos + state]
            pos += state
        else:  # M2 (64..255)
            if t <= 127:
                ln = 3 + ((t >> 5) & 1)
            else:
                ln = 5 + ((t >> 5) & 3)
            h = data[pos]
            pos += 1
            copy_match((h << 3) + ((t >> 2) & 7) + 1, ln)
            state = t & 3
            out += data[pos : pos + state]
            pos += state
        if pos >= n:
            raise ValueError("lzo1x: truncated stream (no EOS marker)")
        t = data[pos]
        pos += 1
    if expected_len is not None and len(out) != expected_len:
        raise ValueError(f"lzo1x: length mismatch {len(out)} != {expected_len}")
    return bytes(out)


def lzo1x_compress(data: bytes) -> bytes:
    """Minimal VALID LZO1X stream: one literal run (+ extensions) + EOS."""
    out = bytearray()
    n = len(data)
    if n == 0:
        out += bytes([17, 0, 0])  # EOS only
        return bytes(out)
    if n <= 238:  # first-byte special literal run
        out.append(n + 17)
        out += data
    else:
        # state-0 long literal instruction: length = zeros*255 + nz + 18,
        # nz in 1..255 -> k = (n-19)//255 zero bytes, then the remainder
        k = (n - 19) // 255
        out.append(0)
        out += bytes(k)
        out.append(n - 18 - 255 * k)
        out += data
    out += bytes([17, 0, 0])  # M4 dist=16384 = EOS
    return bytes(out)


# ---------------------------------------------------------------------------
# lzo_deflate: anarres LzoInputStream block framing

def lzo_deflate_uncompress(data: bytes) -> bytes:
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        (ulen,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        if ulen == 0:
            break
        (clen,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        block = data[pos : pos + clen]
        pos += clen
        if clen == ulen:  # stored
            out += block
        else:
            out += lzo1x_decompress(block, ulen)
    return bytes(out)


def lzo_deflate_compress(data: bytes, block_size: int = 256 * 1024) -> bytes:
    out = bytearray()
    for pos in range(0, len(data) or 1, block_size):
        block = data[pos : pos + block_size]
        comp = lzo1x_compress(block)
        if len(comp) < len(block):
            out += struct.pack(">II", len(block), len(comp)) + comp
        else:
            out += struct.pack(">II", len(block), len(block)) + block
    return bytes(out)


# ---------------------------------------------------------------------------
# lzo: lzop container

_LZOP_MAGIC = b"\x89LZO\x00\r\n\x1a\n"
_F_ADLER32_D = 0x0001
_F_ADLER32_C = 0x0002
_F_CRC32_D = 0x0100
_F_CRC32_C = 0x0200
_F_H_FILTER = 0x0800
_F_H_CRC32 = 0x1000


def lzop_uncompress(data: bytes, verify_checksums: bool = True,
                    limit: "int | None" = None) -> bytes:
    if data[: len(_LZOP_MAGIC)] != _LZOP_MAGIC:
        raise ValueError("lzo: bad lzop magic")
    pos = len(_LZOP_MAGIC)

    def u16():
        nonlocal pos
        (v,) = struct.unpack(">H", data[pos : pos + 2])
        pos += 2
        return v

    def u32():
        nonlocal pos
        (v,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        return v

    version = u16()
    u16()  # lib_version
    if version >= 0x0940:
        u16()  # version_needed_to_extract
    pos += 1  # method
    if version >= 0x0940:
        pos += 1  # level
    flags = u32()
    if flags & _F_H_FILTER:
        u32()
    u32()  # mode
    u32()  # mtime_low
    if version >= 0x0940:
        u32()  # mtime_high
    fname_len = data[pos]
    pos += 1 + fname_len
    u32()  # header checksum (not verified: adler/crc over header bytes)

    out = bytearray()
    n = len(data)
    while pos < n:
        if limit is not None and len(out) >= limit:
            break
        ulen = u32()
        if ulen == 0:
            break
        clen = u32()
        # format-legal files may set BOTH checksum variants per side —
        # each set flag contributes its own 4-byte word
        d_adler = u32() if flags & _F_ADLER32_D else None
        if flags & _F_CRC32_D:
            u32()  # crc32_d (not verified; position must still advance)
        d_check = d_adler
        if clen < ulen:
            if flags & _F_ADLER32_C:
                u32()  # adler32_c (omitted for stored blocks)
            if flags & _F_CRC32_C:
                u32()
        block = data[pos : pos + clen]
        pos += clen
        piece = block if clen == ulen else lzo1x_decompress(block, ulen)
        if verify_checksums and d_check is not None and flags & _F_ADLER32_D:
            if zlib.adler32(piece) & 0xFFFFFFFF != d_check:
                raise ValueError("lzo: adler32 mismatch")
        out += piece
    return bytes(out)


def lzop_compress(data: bytes, block_size: int = 256 * 1024) -> bytes:
    """Minimal valid lzop container (version 0x0940, LZO1X, adler32_d)."""
    hdr = bytearray()
    hdr += struct.pack(">H", 0x0940)  # version
    hdr += struct.pack(">H", 0x2080)  # lib version
    hdr += struct.pack(">H", 0x0940)  # version needed
    hdr += bytes([1, 5])  # method LZO1X_1, level 5
    hdr += struct.pack(">I", _F_ADLER32_D)  # flags
    hdr += struct.pack(">I", 0o644)  # mode
    hdr += struct.pack(">I", 0)  # mtime low
    hdr += struct.pack(">I", 0)  # mtime high
    hdr += bytes([0])  # no filename
    hdr += struct.pack(">I", zlib.adler32(bytes(hdr)) & 0xFFFFFFFF)

    out = bytearray(_LZOP_MAGIC) + hdr
    for posn in range(0, len(data) or 1, block_size):
        block = data[posn : posn + block_size]
        comp = lzo1x_compress(block)
        if len(comp) < len(block):
            out += struct.pack(">II", len(block), len(comp))
            out += struct.pack(">I", zlib.adler32(block) & 0xFFFFFFFF)
            out += comp
        else:
            out += struct.pack(">II", len(block), len(block))
            out += struct.pack(">I", zlib.adler32(block) & 0xFFFFFFFF)
            out += block
    out += struct.pack(">I", 0)  # EOF block
    return bytes(out)


# ---------------------------------------------------------------------------
# registry (reference `compress` config values, :124-213)

DECODERS = {
    "lzo": lzop_uncompress,
    "lzo_deflate": lzo_deflate_uncompress,
    "hadoop-snappy": hadoop_snappy_uncompress,
    "snappy": hadoop_snappy_uncompress,  # hadoop exports label these .snappy
    "framing-snappy": framing_snappy_uncompress,
}

ENCODERS = {
    "lzo": lzop_compress,
    "lzo_deflate": lzo_deflate_compress,
    "hadoop-snappy": hadoop_snappy_compress,
    "snappy": hadoop_snappy_compress,
    "framing-snappy": framing_snappy_compress,
}

# file-extension -> codec name (for auto-detection at the read)
EXT_CODECS = {
    ".lzo": "lzo",
    ".lzo_deflate": "lzo_deflate",
    ".snappy": "hadoop-snappy",
    ".framing-snappy": "framing-snappy",
}
