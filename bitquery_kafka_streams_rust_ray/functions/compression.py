"""Payload decompression with format sniffing (M1-M3).

Re-implements the semantics of the reference's
``src/core/utils/compression.rs:17-200``: payloads may be raw, LZ4
block-compressed with a little-endian uncompressed-size prefix
(``lz4_flex::decompress_size_prepended`` framing), or gzip. The safe
path sniffs the format with the same heuristics and falls back to the
raw bytes when nothing matches or decompression fails.

LZ4 here uses pyarrow's ``lz4_raw`` codec (the raw LZ4 block format),
which is byte-compatible with ``lz4_flex``'s block payload; the 4-byte
size prefix is handled explicitly.
"""

from __future__ import annotations

import gzip
import struct

import pyarrow as pa

_LZ4 = pa.Codec("lz4_raw")
_MAX_UNCOMPRESSED = 100 * 1024 * 1024  # reference compression.rs:148


class CompressionError(ValueError):
    """Decompression failed or input did not look like the claimed format."""


def is_likely_lz4_compressed(data: bytes) -> bool:
    """Sniff size-prepended LZ4 block data (reference compression.rs:137-169).

    Requires >=16 bytes total, a plausible non-zero size prefix (<=100MB)
    and a claimed compression ratio within [0.1, 10.0].
    """
    if len(data) < 16:
        return False
    size_prefix = struct.unpack_from("<I", data)[0]
    if size_prefix == 0 or size_prefix > _MAX_UNCOMPRESSED:
        return False
    ratio = size_prefix / (len(data) - 4)
    return 0.1 <= ratio <= 10.0


def is_likely_gzip_compressed(data: bytes) -> bool:
    """Sniff a gzip header (reference compression.rs:101-131).

    Magic ``1f 8b``, deflate method byte 8, reserved flag bits clear,
    and at least 20 bytes overall.
    """
    if len(data) < 20:
        return False
    if data[0] != 0x1F or data[1] != 0x8B:
        return False
    if data[2] != 8:
        return False
    return (data[3] & 0xE0) == 0


def compress_lz4(data: bytes) -> bytes:
    """Size-prepended LZ4 block compression (fixture-generation helper)."""
    comp = _LZ4.compress(data)
    return struct.pack("<I", len(data)) + bytes(comp)


def compress_gzip(data: bytes) -> bytes:
    """Deterministic gzip (mtime pinned to 0 so output is byte-stable)."""
    return gzip.compress(data, mtime=0)


def decompress_lz4(data: bytes) -> bytes:
    """Strict LZ4 decompression (reference compression.rs:17-40)."""
    if not data:
        raise CompressionError("empty input for LZ4 decompression")
    if not is_likely_lz4_compressed(data):
        raise CompressionError("data does not appear to be LZ4 compressed")
    size = struct.unpack_from("<I", data)[0]
    try:
        out = _LZ4.decompress(data[4:], decompressed_size=size)
    except (pa.ArrowException, OSError, ValueError) as exc:
        raise CompressionError(f"LZ4 decompression error: {exc}") from exc
    return bytes(out)


def decompress_gzip(data: bytes) -> bytes:
    """Strict gzip decompression (reference compression.rs:179-200)."""
    if not data:
        raise CompressionError("empty input for gzip decompression")
    try:
        return gzip.decompress(data)
    except (OSError, EOFError, struct.error) as exc:
        raise CompressionError(f"gzip decompression error: {exc}") from exc


def decompress_safe(data: bytes) -> bytes:
    """Best-effort decompression; on any failure return the raw bytes.

    Order and fallbacks mirror reference ``compression.rs:54-94``:
    try LZ4 iff it sniffs as LZ4, then gzip iff it sniffs as gzip,
    else pass through unchanged. Never raises.
    """
    if not data:
        return data
    if is_likely_lz4_compressed(data):
        try:
            return decompress_lz4(data)
        except CompressionError:
            pass
    if is_likely_gzip_compressed(data):
        try:
            return decompress_gzip(data)
        except CompressionError:
            pass
    return data


def decompress_column(column: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Apply :func:`decompress_safe` to a binary Arrow column.

    The per-element work is inherently scalar (format sniff + codec
    call), so this is a tight Python loop over buffer-backed bytes;
    callers should run it inside ``map_batches`` so batches decompress
    in parallel across the cluster.
    """
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    out = [None if v is None else decompress_safe(v) for v in column.to_pylist()]
    return pa.array(out, type=pa.large_binary())
