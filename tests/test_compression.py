"""Ports the reference's compression unit tests (compression.rs:202-394)."""

import pytest

from bitquery_kafka_streams_rust_ray.functions.compression import (
    CompressionError,
    compress_gzip,
    compress_lz4,
    decompress_gzip,
    decompress_lz4,
    decompress_safe,
    is_likely_gzip_compressed,
    is_likely_lz4_compressed,
)

PAYLOAD = (
    b"This is a test string that will be compressed and then decompressed. "
    b"It needs to be reasonably long for compression to be effective." * 3
)


def test_lz4_round_trip():
    assert decompress_lz4(compress_lz4(PAYLOAD)) == PAYLOAD


def test_gzip_round_trip():
    assert decompress_gzip(compress_gzip(PAYLOAD)) == PAYLOAD


def test_gzip_deterministic():
    assert compress_gzip(PAYLOAD) == compress_gzip(PAYLOAD)


def test_lz4_empty_input_rejected():
    with pytest.raises(CompressionError):
        decompress_lz4(b"")


def test_gzip_empty_input_rejected():
    with pytest.raises(CompressionError):
        decompress_gzip(b"")


def test_lz4_invalid_data_rejected():
    with pytest.raises(CompressionError):
        decompress_lz4(b"definitely not lz4 data at all..........")


def test_lz4_corrupted_size_prefix():
    framed = bytearray(compress_lz4(PAYLOAD))
    framed[:4] = (2**31 - 1).to_bytes(4, "little")  # absurd claimed size
    with pytest.raises(CompressionError):
        decompress_lz4(bytes(framed))


def test_safe_falls_back_to_raw():
    junk = b"neither lz4 nor gzip, just some plain bytes here"
    assert decompress_safe(junk) == junk


def test_safe_empty():
    assert decompress_safe(b"") == b""


def test_safe_decompresses_both_formats():
    assert decompress_safe(compress_lz4(PAYLOAD)) == PAYLOAD
    assert decompress_safe(compress_gzip(PAYLOAD)) == PAYLOAD


def test_lz4_sniffer():
    assert is_likely_lz4_compressed(compress_lz4(PAYLOAD))
    assert not is_likely_lz4_compressed(b"short")
    assert not is_likely_lz4_compressed(b"\x00\x00\x00\x00" + b"x" * 20)  # zero size
    # ratio out of [0.1, 10] range
    assert not is_likely_lz4_compressed((1_000_000).to_bytes(4, "little") + b"x" * 12)


def test_gzip_sniffer():
    assert is_likely_gzip_compressed(compress_gzip(PAYLOAD))
    assert not is_likely_gzip_compressed(b"\x1f\x8b\x08")  # too short
    assert not is_likely_gzip_compressed(b"\x1f\x8b\x07" + b"\x00" * 20)  # bad method
    assert not is_likely_gzip_compressed(b"\x1f\x8b\x08\xe0" + b"\x00" * 20)  # bad flags
