"""Delta Lake deletion-vector codec: Z85 + portable RoaringBitmapArray.

Pure-stdlib implementation of the two public formats a jar-less Delta
reader needs to honor deletion vectors (the protocol's merge-on-read
row-level deletes, on by default in modern writers):

1. **Z85** (ZeroMQ spec 32/Z85): the protocol encodes DV file UUIDs and
   inline DV payloads in Z85 — NOT the same alphabet as Python's
   ``base64.b85encode`` (RFC-1924 variant), so a tiny codec lives here.

2. **64-bit RoaringBitmapArray, "portable" serialization** (the format
   named by the Delta protocol's deletion-vector spec, identical to the
   Java/Scala RoaringBitmap library's portable format): little-endian
   throughout,

       magic number 1681511377 : int32
       number of 32-bit bitmaps: int64
       per bitmap: key (high 32 bits): int32
                   standard 32-bit roaring portable blob

   where each 32-bit blob is the RoaringFormatSpec layout: cookie 12346
   (no run containers; container count in the next int32) or cookie
   12347 (count-1 in the cookie's high 16 bits, then a run-flag
   bitset), a descriptive header of (key: uint16, cardinality-1:
   uint16) pairs, an offset header (present when cookie = 12346 or
   count >= 4), then the containers in key order — array (uint16
   values, sorted), bitmap (1024 × uint64), or run ((start, len-1)
   uint16 pairs).

3. **DV file blob framing** (Delta protocol "Deletion Vector File
   Storage Format"): a DV file starts with a single version byte = 1;
   each stored DV is ``[dataSize: int32 BIG-endian][data][CRC-32 of
   data: int32 BIG-endian]`` with the descriptor's ``offset`` pointing
   at the dataSize word and ``sizeInBytes`` = len(data). Inline DVs
   ("i" storage) Z85-encode ``data`` directly with no framing.

The decoder handles all three container types (real writers emit run
containers for contiguous deletes); the encoder emits array/bitmap
containers only — valid per the spec, just not always minimal — and is
used by the test fixture writer and round-trip property tests.

Scale: decode is O(serialized size) per deletion vector and runs on
EXECUTORS (sources/delta_py.py maps each descriptor through
mapInPandas); this module itself never touches Spark.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------- Z85

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"z85 input must be a multiple of 4 bytes, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 input must be a multiple of 5 chars, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            try:
                word = word * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if word > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += struct.pack(">I", word)
    return bytes(out)


# ------------------------------------------------- 32-bit roaring (portable)

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def _decode_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one 32-bit roaring bitmap at ``pos``; return (sorted
    values, next position)."""
    start = pos
    (cookie_word,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    cookie = cookie_word & 0xFFFF
    run_flags = b""
    if cookie == _SERIAL_COOKIE:
        size = (cookie_word >> 16) + 1
        nbytes = (size + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"unrecognized roaring cookie {cookie}")

    keys_cards = []
    for i in range(size):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * size  # offsets are redundant for sequential decode

    def is_run(i: int) -> bool:
        return bool(run_flags) and bool(run_flags[i // 8] & (1 << (i % 8)))

    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        if is_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                rstart, rlen_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + rstart, base + rstart + rlen_m1 + 1))
        elif card > _ARRAY_MAX:  # bitmap container: 1024 uint64 words
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
        else:  # array container
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
    del start
    return values, pos


def _encode_roaring32(values: list[int]) -> bytes:
    """Encode sorted, distinct 16-bit-bucketed values as a portable
    32-bit roaring blob (array/bitmap containers only)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    size = len(keys)
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, size)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header: byte positions of each container from blob start
    header_len = 8 + 4 * size + 4 * size
    offs = []
    cur = header_len
    blobs = []
    for k in keys:
        vals = sorted(containers[k])
        if len(vals) > _ARRAY_MAX:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            blob = struct.pack("<1024Q", *words)
        else:
            blob = struct.pack(f"<{len(vals)}H", *vals)
        offs.append(cur)
        cur += len(blob)
        blobs.append(blob)
    out += struct.pack(f"<{size}I", *offs)
    for b in blobs:
        out += b
    return bytes(out)


# ------------------------------------------------ 64-bit RoaringBitmapArray

_MAGIC = 1681511377


def roaring_array_decode(data: bytes) -> list[int]:
    """Portable RoaringBitmapArray bytes → sorted list of 64-bit row
    indexes."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic} (want {_MAGIC})")
    (n,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n):
        (high,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = _decode_roaring32(data, pos)
        base = high << 32
        out.extend(base + v for v in vals)
    return out


def roaring_array_encode(positions: list[int]) -> bytes:
    """Sorted-or-not 64-bit row indexes → portable RoaringBitmapArray
    bytes (fixture/test writer)."""
    by_high: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        if p < 0:
            raise ValueError(f"negative row index {p}")
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", _MAGIC, len(by_high)))
    for high in sorted(by_high):
        out += struct.pack("<i", high)
        out += _encode_roaring32(by_high[high])
    return bytes(out)


# ------------------------------------------------------- DV blob framing


def read_dv_blob(raw: bytes, offset: int, size_in_bytes: int) -> list[int]:
    """Extract one framed DV from a DV file's bytes: verify the length
    word and CRC-32, then decode the bitmap."""
    (data_size,) = struct.unpack_from(">i", raw, offset)
    if data_size != size_in_bytes:
        raise ValueError(
            f"DV length mismatch: frame says {data_size}, descriptor says {size_in_bytes}"
        )
    data = raw[offset + 4 : offset + 4 + data_size]
    (crc,) = struct.unpack_from(">I", raw, offset + 4 + data_size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("DV checksum mismatch (corrupt deletion vector)")
    return roaring_array_decode(data)


def write_dv_file(path: str, positions: list[int]) -> tuple[int, int]:
    """Write a single-DV deletion-vector file (version byte 1 + one
    framed blob); returns (offset, sizeInBytes) for the descriptor."""
    data = roaring_array_encode(positions)
    with open(path, "wb") as f:
        f.write(b"\x01")
        f.write(struct.pack(">i", len(data)))
        f.write(data)
        f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return 1, len(data)
