"""Pure-Python BGZF (blocked gzip) codec.

BGZF — the container under BAM — is a sequence of independent gzip
members, each carrying its own compressed size in a 'BC' extra-field
subfield. That per-block framing is exactly what makes BAM splittable:
any block boundary is a safe decompression start, so a 100 TB corpus
can be read by many tasks, each assigned a block range.

Only the stdlib (zlib, struct) is used: the reader/writer pair lets the
engine ingest real BAM without pysam and lets tests synthesize valid
files. Reference semantics: SAMv1/BGZF spec (public format), mirroring
what ADAM's loadAlignments consumes (reference BamReader.scala:100-101).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

# spec-fixed empty final block marking EOF
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)
_HEADER = struct.Struct("<4BI2BH")  # magic, CM, FLG, MTIME, XFL, OS, XLEN
_SUBFIELD = struct.Struct("<2B H")
MAX_PAYLOAD = 65280  # spec: uncompressed bytes per block <= 64 KiB - 256


def _block(payload: bytes) -> bytes:
    """One BGZF block: gzip member with the BC/BSIZE extra subfield."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    deflated = co.compress(payload) + co.flush()
    bsize = 12 + 6 + len(deflated) + 8  # header + extra + data + crc/isize
    header = _HEADER.pack(0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6)
    extra = _SUBFIELD.pack(ord("B"), ord("C"), 2) + struct.pack(
        "<H", bsize - 1
    )
    footer = struct.pack("<II", zlib.crc32(payload), len(payload))
    return header + extra + deflated + footer


def compress_fragment(data: bytes, block_payload: int = MAX_PAYLOAD) -> bytes:
    """``data`` as complete BGZF blocks WITHOUT the EOF marker.

    gzip members are self-delimiting, so fragments produced by
    independent tasks concatenate byte-for-byte into one valid BGZF
    stream — the property the single-file BAM sink builds on (parallel
    encode, serial stitch; same trick as Hadoop-BAM/Disq shard files).
    """
    assert 0 < block_payload <= MAX_PAYLOAD
    return b"".join(
        _block(data[i : i + block_payload])
        for i in range(0, len(data), block_payload)
    )


def write_bgzf(path: str, data: bytes, block_payload: int = MAX_PAYLOAD) -> None:
    """Write ``data`` as a BGZF file of ``block_payload``-sized blocks."""
    with open(path, "wb") as f:
        f.write(compress_fragment(data, block_payload))
        f.write(BGZF_EOF)


def _read_block_at(f) -> tuple[int, bytes] | None:
    """Parse one block at the current file position → (bsize, payload),
    or None at EOF. Raises ValueError on non-BGZF bytes."""
    pos_header = f.read(12)
    if not pos_header:
        return None
    if len(pos_header) < 12:
        raise ValueError("truncated BGZF header")
    m1, m2, cm, flg, _mtime, _xfl, _os, xlen = _HEADER.unpack(pos_header)
    if (m1, m2, cm) != (0x1F, 0x8B, 8) or not flg & 4:
        raise ValueError("not a BGZF block (bad gzip/FEXTRA header)")
    extra = f.read(xlen)
    bsize = None
    off = 0
    while off + 4 <= len(extra):
        si1, si2, slen = _SUBFIELD.unpack_from(extra, off)
        if (si1, si2) == (ord("B"), ord("C")) and slen == 2:
            bsize = struct.unpack_from("<H", extra, off + 4)[0] + 1
        off += 4 + slen
    if bsize is None:
        raise ValueError("BGZF block missing BC/BSIZE subfield")
    deflated = f.read(bsize - 12 - xlen - 8)
    crc, isize = struct.unpack("<II", f.read(8))
    payload = zlib.decompress(deflated, -15)
    if len(payload) != isize or zlib.crc32(payload) != crc:
        raise ValueError("BGZF block payload CRC/length mismatch")
    return bsize, payload


def iter_blocks(
    path: str, from_coffset: int = 0
) -> Iterator[tuple[int, bytes]]:
    """Yield (compressed_offset, payload) per block, starting at a block
    boundary ``from_coffset``. Empty payloads (the EOF block) included."""
    with open(path, "rb") as f:
        f.seek(from_coffset)
        coffset = from_coffset
        while True:
            parsed = _read_block_at(f)
            if parsed is None:
                return
            bsize, payload = parsed
            yield coffset, payload
            coffset += bsize


def block_offsets(path: str) -> list[int]:
    """Compressed offset of every block — the safe split points."""
    return [coffset for coffset, _ in iter_blocks(path)]


def read_all(path: str) -> bytes:
    """Full decompressed stream (small files / tests)."""
    return b"".join(payload for _, payload in iter_blocks(path))
