"""Puffin file codec for Iceberg v3 deletion vectors — jar-less, stdlib
only.

Puffin (the Iceberg auxiliary-blob format, public spec at
https://iceberg.apache.org/puffin-spec/) is a container of typed blobs
with a JSON footer:

    Magic "PFA1"
    <blob bytes>...
    Magic "PFA1"  <footer payload JSON>  <payload size: int32 LE>
    <flags: 4 bytes>  Magic "PFA1"

Iceberg v3 stores row-level deletes as ``deletion-vector-v1`` blobs
(spec "Deletion vectors"): per referenced data file, one blob framed as

    <combined length of magic+vector: int32 BE>
    <magic bytes D1 D3 39 64>
    <vector: 64-bit RoaringBitmapArray, "portable" serialization>
    <CRC-32 of magic+vector: uint32 BE>

— BYTE-IDENTICAL to the Delta deletion-vector frame (the v3 spec chose
the format for exactly that interoperability), so the decode reuses
sources/dv_roaring.py verbatim: the portable bitmap's leading magic int
(1681511377 little-endian == bytes D1 D3 39 64) is the frame's magic.

Scan-side note: readers locate a DV by the manifest entry's
``content_offset`` / ``content_size_in_bytes`` (the whole frame), so
reads never parse the footer; the footer is still written
spec-complete (blob type, referenced-data-file and cardinality
properties, snapshot-id, sequence-number) for third-party readers.

Reference tie: the reference registers object formats and hands scan
planning to its engine (src/db/db.go:22-43); DV resolution is part of
that delegated scan planning, rebuilt here.
"""

from __future__ import annotations

import json
import struct
import zlib

from gcs2postgres_spark.sources.dv_roaring import (
    roaring_array_decode,
    roaring_array_encode,
)

MAGIC = b"PFA1"
DV_BLOB_TYPE = "deletion-vector-v1"


def frame_dv(positions: list[int]) -> bytes:
    """One framed deletion-vector blob: length-prefixed portable
    RoaringBitmapArray (its own leading magic int IS the spec's
    D1 D3 39 64 magic) plus the big-endian CRC-32."""
    data = roaring_array_encode(positions)
    return struct.pack(">i", len(data)) + data + struct.pack(
        ">I", zlib.crc32(data) & 0xFFFFFFFF
    )


def read_dv_frame(raw: bytes, offset: int, size_in_bytes: int) -> list[int]:
    """Decode one DV frame addressed by a manifest entry's
    ``content_offset`` / ``content_size_in_bytes`` (the WHOLE frame:
    length word + magic+vector + CRC). Verifies both the length word
    and the checksum before decoding."""
    (data_size,) = struct.unpack_from(">i", raw, offset)
    if data_size != size_in_bytes - 8:
        raise ValueError(
            f"DV frame length {data_size} != content_size_in_bytes "
            f"{size_in_bytes} - 8 (corrupt descriptor?)"
        )
    data = raw[offset + 4 : offset + 4 + data_size]
    (crc,) = struct.unpack_from(">I", raw, offset + 4 + data_size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("DV checksum mismatch (corrupt deletion vector)")
    return roaring_array_decode(data)


def render_puffin_dv(
    dvs: list[tuple[str, list[int]]],
    snapshot_id: int,
    sequence_number: int,
) -> tuple[bytes, dict[str, tuple[int, int, int]]]:
    """The BYTES of a Puffin file holding one ``deletion-vector-v1``
    blob per (referenced data file, deleted positions) pair, plus
    ``{referenced file -> (content_offset, content_size_in_bytes,
    cardinality)}`` for the manifest entries. Footer blob metadata
    carries the spec's ``referenced-data-file`` and ``cardinality``
    properties. Pure — callers decide where the bytes land (posix from
    executors, fsio/Hadoop from the driver for scheme'd tables)."""
    blobs_meta = []
    out = {}
    body = bytearray(MAGIC)
    for ref_file, positions in dvs:
        frame = frame_dv(positions)
        offset = len(body)
        body += frame
        card = len(set(positions))
        blobs_meta.append(
            {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": offset,
                "length": len(frame),
                "properties": {
                    "referenced-data-file": ref_file,
                    "cardinality": str(card),
                },
            }
        )
        out[ref_file] = (offset, len(frame), card)
    payload = json.dumps({"blobs": blobs_meta, "properties": {}}).encode()
    body += MAGIC + payload + struct.pack("<i", len(payload)) + b"\x00\x00\x00\x00" + MAGIC
    return bytes(body), out


def write_puffin_dv_file(
    path: str,
    dvs: list[tuple[str, list[int]]],
    snapshot_id: int,
    sequence_number: int,
) -> dict[str, tuple[int, int, int]]:
    """render_puffin_dv + posix write (the executor-local fast path)."""
    body, out = render_puffin_dv(dvs, snapshot_id, sequence_number)
    with open(path, "wb") as f:
        f.write(body)
    return out


def read_puffin_footer(raw: bytes) -> dict:
    """Parse a Puffin file's footer payload (test/validation surface —
    the scan path addresses blobs straight from the manifest)."""
    if raw[:4] != MAGIC or raw[-4:] != MAGIC:
        raise ValueError("not a Puffin file (magic mismatch)")
    flags = raw[-8:-4]
    if flags[0] & 0x01:
        raise NotImplementedError("compressed Puffin footer payload")
    (payload_size,) = struct.unpack("<i", raw[-12:-8])
    payload = raw[-12 - payload_size : -12]
    return json.loads(payload.decode())
