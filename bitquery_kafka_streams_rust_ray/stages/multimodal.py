"""Multimodal columns: opaque binary payloads + typed metadata.

Convention: an image/audio/video column is ``large_binary`` alongside a
metadata struct (``{kind, width, height, sample_rate, n_frames, ...}``).
Decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages with small batches (payloads are wide rows).

Two decode tiers per modality:

* **real wire formats, stdlib-decodable** — baseline JPEG
  (``\\xff\\xd8`` SOI; :func:`encode_jpeg` / :func:`decode_jpeg`
  implement the full T.81 sequential-DCT path — Annex K quantization
  and Huffman tables, zigzag, byte stuffing, restart markers, EXTEND —
  in numpy/stdlib; the entropy layer is lossless, so decode equals the
  quantize-reconstruct math exactly), 8-bit grayscale PNG
  (``\\x89PNG`` signature; :func:`encode_png` / :func:`decode_png`
  un-apply all five scanline filters over stdlib-zlib IDAT, CRC
  checked per chunk), single-frame GIF89a
  (``GIF8`` magic; :func:`encode_gif` / :func:`decode_gif` implement
  the variable-width LZW coder with clear/EOI codes and 4096-entry
  table resets in pure numpy/stdlib), uncompressed 24-bit BMP
  (``BM`` magic, BITMAPINFOHEADER, bottom-up BGR rows with 4-byte row
  padding; :func:`encode_bmp` / :func:`decode_bmp` via ``struct``) and
  PCM WAV (``RIFF`` magic; :func:`encode_wav` / :func:`decode_wav` via
  the stdlib ``wave`` module) and RIFF AVI in two REAL codecs —
  uncompressed 24-bit DIB and Motion-JPEG (one baseline JPEG per
  ``00dc`` chunk, fcc ``MJPG`` — real COMPRESSED video, playable by
  stock players) — via :func:`encode_avi` / :func:`decode_avi`;
  ``FrameSampleStage`` emits its sampled frames as real BMPs. Every
  stage sniffs these first, so EVERY modality exercises a real wire
  format end to end.
* **deterministic fake containers** (``FAKEIMG``/``FAKEAUD``/
  ``FAKEVID`` headers, :func:`fake_image` / :func:`fake_audio` /
  :func:`fake_video`) standing in for the codecs that are NOT in this
  container (ffmpeg inter-frame video: H.264 and friends):
  ``require_real_codecs=True`` raises ``NotImplementedError`` for
  those (clearly-marked stub), and the fake path keeps the Ray-side
  plumbing — schema, batch sizing, actor signatures, output layout —
  real and tested end-to-end.

Anything that sniffs as neither is quarantined (null feature row —
the reference's poison-message skip, src/consumer.rs F8 semantics).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa

_IMG_MAGIC = b"FAKEIMG1"
_AUD_MAGIC = b"FAKEAUD1"
_VID_MAGIC = b"FAKEVID1"


# --- real wire formats (stdlib-only codecs) ----------------------------

def encode_bmp(gray: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale array as a REAL uncompressed
    24-bit BMP (gray replicated into BGR), byte-compatible with any
    image viewer: BITMAPFILEHEADER + BITMAPINFOHEADER(40), BI_RGB,
    bottom-up rows padded to 4 bytes."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = np.repeat(gray[::-1], 3, axis=1)  # bottom-up, B=G=R=gray
    rows[:, : w * 3] = bgr
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Decode an uncompressed 24-bit BI_RGB BMP to a (h, w) uint8 gray
    array (blue channel; encode_bmp writes B=G=R). Returns None for
    BMPs this minimal decoder doesn't cover (compressed, non-24-bit,
    truncated) — callers quarantine those rows."""
    try:
        if payload[:2] != b"BM" or len(payload) < 54:
            return None
        data_off = struct.unpack_from("<I", payload, 10)[0]
        (hdr_sz, w, h, _planes, bpp, compression) = struct.unpack_from(
            "<IiiHHI", payload, 14)
        if hdr_sz < 40 or bpp != 24 or compression != 0 or w <= 0 \
                or h == 0:  # zero-height = poison, not a (0, w) array
            return None
        bottom_up = h > 0
        h = abs(h)
        row_bytes = (w * 3 + 3) & ~3
        if len(payload) < data_off + row_bytes * h:
            return None
        rows = np.frombuffer(payload, dtype=np.uint8, offset=data_off,
                             count=row_bytes * h).reshape(h, row_bytes)
        gray = rows[:, : w * 3 : 3]  # blue channel of each BGR triple
        return gray[::-1] if bottom_up else gray.copy()
    except (struct.error, ValueError):
        return None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(gray: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale array as a REAL PNG (8-bit
    grayscale, filter 0 scanlines, one zlib IDAT, CRC-checked chunks)
    — byte-compatible with any viewer; stdlib zlib does the deflate."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, no ilace
    raw = np.zeros((h, w + 1), dtype=np.uint8)
    raw[:, 1:] = gray  # filter byte 0 per scanline
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 9))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray | None:
    """Decode an 8-bit grayscale non-interlaced PNG to a (h, w) uint8
    array, un-applying all five scanline filters (None/Sub/Up/Average/
    Paeth). Returns None for variants this minimal decoder doesn't
    cover (color, palette, 16-bit, interlaced, bad CRC, truncated) —
    callers quarantine those rows."""
    try:
        if payload[:8] != _PNG_SIG:
            return None
        pos, w = 8, None
        idat = bytearray()
        while pos + 8 <= len(payload):
            ln, tag = struct.unpack_from(">I4s", payload, pos)
            body = payload[pos + 8:pos + 8 + ln]
            if len(body) != ln:
                return None
            crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                return None
            if tag == b"IHDR":
                w, h, depth, color, _comp, _filt, ilace = struct.unpack(
                    ">IIBBBBB", body)
                if depth != 8 or color != 0 or ilace != 0 \
                        or w == 0 or h == 0:
                    return None
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if w is None or not idat:
            return None
        raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
        if len(raw) != h * (w + 1):
            return None
        raw = raw.reshape(h, w + 1)
        out = np.zeros((h, w), dtype=np.uint8)
        for y in range(h):
            f, line = raw[y, 0], raw[y, 1:].astype(np.int32)
            up = out[y - 1].astype(np.int32) if y else np.zeros(w,
                                                               np.int32)
            if f == 0:
                out[y] = line
            elif f == 2:  # Up
                out[y] = (line + up) & 0xFF
            elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential
                row = np.zeros(w, dtype=np.int32)
                left = 0
                for x in range(w):
                    ul = int(up[x - 1]) if x else 0
                    u = int(up[x])
                    if f == 1:
                        pred = left
                    elif f == 3:
                        pred = (left + u) >> 1
                    else:
                        p = left + u - ul
                        pa_, pb, pcd = abs(p - left), abs(p - u), \
                            abs(p - ul)
                        pred = (left if pa_ <= pb and pa_ <= pcd
                                else u if pb <= pcd else ul)
                    left = (int(line[x]) + pred) & 0xFF
                    row[x] = left
                out[y] = row
            else:
                return None
        return out
    except (struct.error, ValueError, zlib.error):
        return None


def encode_gif(gray: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale array as a REAL single-frame
    GIF89a (grayscale global palette, 8-bit LZW with variable code
    widths, clear/EOI codes, 255-byte sub-blocks) — byte-compatible
    with any image viewer. Pure stdlib/numpy; the LZW table resets at
    4096 codes per the spec."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # descriptor
    out += b"\x08"  # LZW minimum code size

    clear, eoi = 256, 257
    codes: list[int] = [clear]
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_size = 9
    cur = b""
    for px in gray.tobytes():
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
            continue
        codes.append(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            codes.append(clear)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_size = 9
        cur = nxt[-1:]
    if cur:
        codes.append(table[cur])
    codes.append(eoi)

    # pack codes LSB-first at the width each was emitted under
    bits = bytearray()
    acc = n_acc = 0
    size = 9
    tbl_n = 258
    for c in codes:
        acc |= c << n_acc
        n_acc += size
        while n_acc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
        if c == clear:
            size, tbl_n = 9, 258
        elif c != eoi:
            tbl_n += 1
            if tbl_n > (1 << size) and size < 12:
                size += 1
    if n_acc:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        chunk = bits[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray | None:
    """Decode a single-frame non-interlaced GIF to a (h, w) uint8 gray
    array (red palette channel; encode_gif writes R=G=B). Returns None
    for variants this minimal decoder doesn't cover (interlaced, local
    color tables, truncated streams) — callers quarantine those."""
    try:
        if payload[:4] != b"GIF8" or len(payload) < 13:
            return None
        w0, h0, flags = struct.unpack_from("<HHB", payload, 6)
        pos = 13
        pal = None
        if flags & 0x80:
            n = 2 << (flags & 7)
            pal = np.frombuffer(payload, np.uint8, n * 3, pos)[::3].copy()
            pos += n * 3
        while pos < len(payload):
            b = payload[pos]
            if b == 0x21:  # extension: skip sub-blocks
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b == 0x2C:
                break
            else:
                return None
        _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", payload,
                                                  pos + 1)
        pos += 10
        if iflags & 0x40 or w == 0 or h == 0:  # interlace unsupported
            return None
        if iflags & 0x80:  # local palette wins
            n = 2 << (iflags & 7)
            pal = np.frombuffer(payload, np.uint8, n * 3, pos)[::3].copy()
            pos += n * 3
        if pal is None:
            return None
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln

        clear, eoi = 1 << min_code, (1 << min_code) + 1
        size = min_code + 1
        table: list[bytes] = [bytes([i]) for i in range(1 << min_code)]
        table += [b"", b""]
        out = bytearray()
        acc = n_acc = 0
        prev: bytes | None = None
        done = False
        for byte in data:
            if done:
                break
            acc |= byte << n_acc
            n_acc += 8
            while n_acc >= size:
                code = acc & ((1 << size) - 1)
                acc >>= size
                n_acc -= size
                if code == clear:
                    table = [bytes([i]) for i in range(1 << min_code)]
                    table += [b"", b""]
                    size = min_code + 1
                    prev = None
                    continue
                if code == eoi:
                    done = True
                    break
                if prev is None:
                    entry = table[code]
                else:
                    if code < len(table):
                        entry = table[code]
                        table.append(prev + entry[:1])
                    elif code == len(table):  # KwKwK
                        entry = prev + prev[:1]
                        table.append(entry)
                    else:
                        return None
                    if (len(table) >= (1 << size) and size < 12):
                        size += 1
                out += entry
                prev = entry
        if len(out) != w * h:
            return None
        return pal[np.frombuffer(bytes(out), np.uint8)].reshape(h, w)
    except (struct.error, ValueError, IndexError):
        return None


# --- REAL baseline JPEG (ITU-T T.81, stdlib + numpy only) ---------------
# Sequential baseline DCT, 8-bit, Annex K quantization + Huffman tables.
# The encoder writes single-component (grayscale) 4:4:4 JPEGs; the
# decoder additionally reads interleaved multi-component scans with all
# sampling factors 1x1 (4:4:4 color -> returns the luma plane) and
# honors restart markers. Progressive (SOF2) and chroma-subsampled
# streams return None -> quarantine, like every other codec here.

_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_JPEG_QBASE = np.array([  # Annex K luminance, zigzag-free (row-major)
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_dct_matrix() -> np.ndarray:
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m * 0.5


_JPEG_DCT = _jpeg_dct_matrix()


def _jpeg_qtable(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex K luminance table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_JPEG_QBASE * scale + 50) // 100
    return np.clip(q, 1, 255)


def _jpeg_build_codes(bits, vals):
    """T.81 C.2: (symbol -> (code, length)) from BITS/HUFFVAL."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_decode_map(bits, vals):
    """(length, code) -> symbol map for the decoder."""
    enc = _jpeg_build_codes(bits, vals)
    return {(ln, cd): sym for sym, (cd, ln) in enc.items()}


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def restart(self, m: int) -> None:
        """Byte-align (1-fill) and emit RSTm — marker bytes bypass the
        0xFF stuffing by construction (written directly)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(size, additional-bits) magnitude coding of a DC diff / AC coef."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _jpeg_plane_zz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """uint8 plane -> quantized coefficients in zigzag order, one row
    per 8x8 block in raster (MCU) order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    img = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    img -= 128.0
    bh, bw = img.shape[0] // 8, img.shape[1] // 8
    blocks = img.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = np.einsum("ij,njk,lk->nil", _JPEG_DCT, blocks, _JPEG_DCT)
    qcoef = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    return qcoef.reshape(-1, 64)[:, _JPEG_ZIGZAG]


def _jpeg_encode_block(bw_: "_JpegBitWriter", blk: np.ndarray,
                       prev_dc: int, dc_codes: dict, ac_codes: dict) -> int:
    size, bits = _jpeg_magnitude(int(blk[0]) - prev_dc)
    code, ln = dc_codes[size]
    bw_.write(code, ln)
    if size:
        bw_.write(bits, size)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw_.write(code, ln)
            run -= 16
        size, bits = _jpeg_magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        bw_.write(code, ln)
        bw_.write(bits, size)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw_.write(code, ln)
    return int(blk[0])


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _jpeg_assemble(planes: list[np.ndarray], quality: int,
                   restart_interval: int) -> bytes:
    """Shared encoder core: 1 (gray) or 3 (YCbCr 4:4:4) uint8 planes,
    interleaved baseline scan, optional DRI/RSTn restart markers (all
    components share the Annex K luminance tables)."""
    h, w = planes[0].shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = _jpeg_qtable(quality)
    zzs = [_jpeg_plane_zz(p, q) for p in planes]
    n_mcu = zzs[0].shape[0]

    dc_codes = _jpeg_build_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_build_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw_ = _JpegBitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw_.restart(rst)
            rst = (rst + 1) & 7
            preds = [0] * len(planes)
        for c, zz in enumerate(zzs):
            preds[c] = _jpeg_encode_block(bw_, zz[m], preds[c],
                                          dc_codes, ac_codes)
    entropy = bw_.flush()

    nc = len(planes)
    dqt = _jpeg_seg(0xFFDB, b"\x00" + bytes(int(x) for x in q[_JPEG_ZIGZAG]))
    sof = _jpeg_seg(0xFFC0, struct.pack(">BHHB", 8, h, w, nc)
                    + b"".join(bytes([c + 1, 0x11, 0])
                               for c in range(nc)))
    dht = (_jpeg_seg(0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS)
                     + bytes(_JPEG_DC_VALS))
           + _jpeg_seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_BITS)
                       + bytes(_JPEG_AC_VALS)))
    dri = (_jpeg_seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = _jpeg_seg(0xFFDA, bytes([nc])
                    + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
                    + b"\x00\x3f\x00")
    return (b"\xff\xd8" + dqt + sof + dht + dri + sos + entropy
            + b"\xff\xd9")


def encode_jpeg(gray: np.ndarray, quality: int = 90,
                restart_interval: int = 0) -> bytes:
    """Encode a (h, w) uint8 array as a REAL baseline grayscale JPEG
    (``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs — the error-resilience layout streaming encoders produce)."""
    gray = np.asarray(gray, dtype=np.uint8)
    return _jpeg_assemble([gray], quality, restart_interval)


def encode_jpeg_color_420(rgb: np.ndarray, quality: int = 90,
                          restart_interval: int = 0) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a REAL baseline 4:2:0 COLOR JPEG
    (luma 2x2, chroma quarter-resolution via 2x2 mean — the sampling
    layout most web JPEGs actually use). 16x16 MCUs carry four Y
    blocks (2x2 raster) + one Cb + one Cr; :func:`decode_jpeg` reads
    back the luma plane, byte-identical to the grayscale encoding of
    the same Y (subsampling touches only chroma)."""
    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b),
                0, 255).astype(np.uint8)
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    # 2x2 mean downsample on the edge-padded plane
    ph, pw = -h % 2, -w % 2

    def down(p: np.ndarray) -> np.ndarray:
        p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
        q_ = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
        return np.clip(np.round(q_.mean(axis=(1, 3))), 0,
                       255).astype(np.uint8)

    cbd, crd = down(cb), down(cr)
    q = _jpeg_qtable(quality)
    mrows, mcols = (h + 15) // 16, (w + 15) // 16
    # luma: pad to the 16-multiple MCU grid, blocks in plane raster,
    # then regroup 2x2 per MCU (the decoder's inverse reorder)
    ypad = np.pad(y, ((0, mrows * 16 - h), (0, mcols * 16 - w)),
                  mode="edge")
    yzz = _jpeg_plane_zz(ypad, q)  # (2*mrows * 2*mcols, 64) raster
    yzz = (yzz.reshape(mrows, 2, mcols, 2, 64)
           .transpose(0, 2, 1, 3, 4).reshape(-1, 64))  # MCU-major
    # chroma: pad each quarter plane to its 8-multiple MCU grid
    czzs = []
    for p in (cbd, crd):
        ppad = np.pad(p, ((0, mrows * 8 - p.shape[0]),
                          (0, mcols * 8 - p.shape[1])), mode="edge")
        czzs.append(_jpeg_plane_zz(ppad, q))

    dc_codes = _jpeg_build_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_build_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw_ = _JpegBitWriter()
    preds = [0, 0, 0]
    rst = 0
    n_mcu = mrows * mcols
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw_.restart(rst)
            rst = (rst + 1) & 7
            preds = [0, 0, 0]
        for b in range(4):  # Y blocks, raster within the MCU
            preds[0] = _jpeg_encode_block(bw_, yzz[m * 4 + b], preds[0],
                                          dc_codes, ac_codes)
        for c, czz in enumerate(czzs):
            preds[c + 1] = _jpeg_encode_block(bw_, czz[m], preds[c + 1],
                                              dc_codes, ac_codes)
    entropy = bw_.flush()

    dqt = _jpeg_seg(0xFFDB,
                    b"\x00" + bytes(int(x) for x in q[_JPEG_ZIGZAG]))
    sof = _jpeg_seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
                    + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0])
                    + bytes([3, 0x11, 0]))
    dht = (_jpeg_seg(0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS)
                     + bytes(_JPEG_DC_VALS))
           + _jpeg_seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_BITS)
                       + bytes(_JPEG_AC_VALS)))
    dri = (_jpeg_seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = _jpeg_seg(0xFFDA, bytes([3]) + bytes([1, 0x00])
                    + bytes([2, 0x00]) + bytes([3, 0x00])
                    + b"\x00\x3f\x00")
    return (b"\xff\xd8" + dqt + sof + dht + dri + sos + entropy
            + b"\xff\xd9")


def encode_jpeg_color(rgb: np.ndarray, quality: int = 90,
                      restart_interval: int = 0) -> bytes:
    """Encode a (h, w, 3) uint8 RGB array as a REAL baseline COLOR JPEG
    (JFIF YCbCr, 4:4:4 — no chroma subsampling — interleaved scan).
    :func:`decode_jpeg` reads it back as the luma plane (the gray this
    pipeline consumes); stock viewers see full color."""
    rgb = np.asarray(rgb, dtype=np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    planes = [np.clip(np.round(p), 0, 255).astype(np.uint8)
              for p in (y, cb, cr)]
    return _jpeg_assemble(planes, quality, restart_interval)


# Custom Huffman tables for the progressive encoder: fixed-length
# canonical codes covering every symbol (DC: 16 symbols at 5 bits; AC:
# 255 at 9 bits + 1 at 10), so EOBn run codes (absent from the Annex K
# tables) are encodable. Deliberately simple over optimal — decoders
# read any valid DHT.
_JPEG_PROG_DC_BITS = [0, 0, 0, 0, 16] + [0] * 11
_JPEG_PROG_DC_VALS = list(range(16))
_JPEG_PROG_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
_JPEG_PROG_AC_VALS = list(range(256))


class _ProgAcWriter:
    """AC scan emitter state (T.81 G.1.2.2-3): an EOB run and, in
    refinement scans, the correction bits buffered behind it."""

    def __init__(self, bw_: "_JpegBitWriter", ac_codes: dict):
        self.bw = bw_
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, ln = self.ac[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        self.flush_bits()

    def flush_bits(self) -> None:
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def end_block_eob(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:  # EOBn caps at 2^14 + extra
            self.flush_eobrun()


def _prog_ac_first(w_: _ProgAcWriter, blk: np.ndarray, ss: int, se: int,
                   al: int) -> None:
    """One block of an AC first pass: point transform (truncate toward
    zero), run-length + magnitude coding, EOB-run folding."""
    band = blk[ss:se + 1]
    t = np.sign(band) * (np.abs(band) >> al)
    nz = np.nonzero(t)[0]
    if not len(nz):
        w_.end_block_eob()
        return
    w_.flush_eobrun()
    run = 0
    for k in range(nz[-1] + 1):
        v = int(t[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = w_.ac[0xF0]  # ZRL
            w_.bw.write(code, ln)
            run -= 16
        size, bits = _jpeg_magnitude(v)
        code, ln = w_.ac[(run << 4) | size]
        w_.bw.write(code, ln)
        w_.bw.write(bits, size)
        run = 0
    if nz[-1] + 1 <= se - ss:
        w_.end_block_eob()


def _prog_ac_refine(w_: _ProgAcWriter, blk: np.ndarray, ss: int, se: int,
                    al: int) -> None:
    """One block of an AC refinement pass (the G.1.2.3 encoder, in the
    shape of IJG's jcphuff): newly-nonzero coefficients code
    (run|1)+sign, history coefficients contribute one correction bit
    each — buffered block-locally and flushed after the next emitted
    symbol (ZRL or run|1), so the decoder's advance loop reads them in
    position order. Zero runs past the last newly-nonzero coefficient
    fold into the cross-block EOB run (with their correction bits)."""
    band = blk[ss:se + 1]
    absv = np.abs(band) >> al
    newly = np.nonzero(absv == 1)[0]
    eob = newly[-1] if len(newly) else -1
    run = 0
    local: list[int] = []  # correction bits pending behind next symbol
    for k in range(len(band)):
        a = int(absv[k])
        if a == 0:
            run += 1
            continue
        # emit required ZRLs — but only while foldable corrections /
        # newly-nonzero coefficients remain (k <= eob); beyond, runs
        # belong to the EOB run
        while run > 15 and k <= eob:
            w_.flush_eobrun()
            code, ln = w_.ac[0xF0]
            w_.bw.write(code, ln)
            run -= 16
            for b in local:
                w_.bw.write(b, 1)
            local = []
        if a > 1:  # history coefficient: correction bit rides behind
            local.append(a & 1)
            continue
        w_.flush_eobrun()
        code, ln = w_.ac[(run << 4) | 1]
        w_.bw.write(code, ln)
        w_.bw.write(1 if band[k] > 0 else 0, 1)
        for b in local:
            w_.bw.write(b, 1)
        local = []
        run = 0
    if run > 0 or local:
        w_.pending.extend(local)
        w_.end_block_eob()


def _jpeg_assemble_progressive(planes: list[np.ndarray],
                               quality: int,
                               restart_interval: int = 0) -> bytes:
    """Shared progressive encoder core: 1 (gray) or 3 (YCbCr 4:4:4)
    planes; interleaved DC scans (first + refinement), per-component
    AC band scans (spectral selection × successive approximation).
    ``restart_interval`` > 0 emits DRI + RSTn every that many MCUs in
    EVERY scan (byte-align, reset DC predictors + EOB run — the T.81
    restart rule applies per scan)."""
    h, w = planes[0].shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = _jpeg_qtable(quality)
    zzs = [_jpeg_plane_zz(p, q) for p in planes]
    nc = len(planes)

    dc_codes = _jpeg_build_codes(_JPEG_PROG_DC_BITS, _JPEG_PROG_DC_VALS)
    ac_codes = _jpeg_build_codes(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)

    def dc_first(al: int) -> bytes:
        # interleaved: per MCU, every component's DPCM rides together
        bw_ = _JpegBitWriter()
        preds = [0] * nc
        rst = 0
        for m in range(zzs[0].shape[0]):
            if restart_interval and m and m % restart_interval == 0:
                bw_.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * nc
            for c in range(nc):
                t = int(zzs[c][m][0]) >> al  # DC pt transform: arith
                size, bits = _jpeg_magnitude(t - preds[c])
                code, ln = dc_codes[size]
                bw_.write(code, ln)
                if size:
                    bw_.write(bits, size)
                preds[c] = t
        return bw_.flush()

    def dc_refine(al: int) -> bytes:
        bw_ = _JpegBitWriter()
        rst = 0
        for m in range(zzs[0].shape[0]):
            if restart_interval and m and m % restart_interval == 0:
                bw_.restart(rst)
                rst = (rst + 1) & 7
            for c in range(nc):
                bw_.write((int(zzs[c][m][0]) >> al) & 1, 1)
        return bw_.flush()

    def ac_scan(comp: int, ss: int, se: int, al: int,
                refine: bool) -> bytes:
        bw_ = _JpegBitWriter()
        w_ = _ProgAcWriter(bw_, ac_codes)
        rst = 0
        for m, blk in enumerate(zzs[comp]):
            if restart_interval and m and m % restart_interval == 0:
                w_.flush_eobrun()  # EOB runs cannot cross a restart
                bw_.restart(rst)
                rst = (rst + 1) & 7
            (_prog_ac_refine if refine else _prog_ac_first)(
                w_, blk, ss, se, al)
        w_.flush_eobrun()
        return bw_.flush()

    def sos_dc(ah: int, al: int) -> bytes:
        return _jpeg_seg(
            0xFFDA, bytes([nc])
            + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
            + bytes([0, 0, (ah << 4) | al]))

    def sos_ac(comp: int, ss: int, se: int, ah: int, al: int) -> bytes:
        return _jpeg_seg(0xFFDA, bytes([1, comp + 1, 0x00, ss, se,
                                        (ah << 4) | al]))

    dqt = _jpeg_seg(0xFFDB,
                    b"\x00" + bytes(int(x) for x in q[_JPEG_ZIGZAG]))
    dri = (_jpeg_seg(0xFFDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sof = _jpeg_seg(0xFFC2, struct.pack(">BHHB", 8, h, w, nc)
                    + b"".join(bytes([c + 1, 0x11, 0])
                               for c in range(nc)))
    dht = (_jpeg_seg(0xFFC4, b"\x00" + bytes(_JPEG_PROG_DC_BITS)
                     + bytes(_JPEG_PROG_DC_VALS))
           + _jpeg_seg(0xFFC4, b"\x10" + bytes(_JPEG_PROG_AC_BITS)
                       + bytes(_JPEG_PROG_AC_VALS)))
    scans = sos_dc(0, 1) + dc_first(1)
    for c in range(nc):
        scans += (sos_ac(c, 1, 5, 0, 1) + ac_scan(c, 1, 5, 1, False)
                  + sos_ac(c, 6, 63, 0, 1) + ac_scan(c, 6, 63, 1, False))
    scans += sos_dc(1, 0) + dc_refine(0)
    for c in range(nc):
        scans += (sos_ac(c, 1, 5, 1, 0) + ac_scan(c, 1, 5, 0, True)
                  + sos_ac(c, 6, 63, 1, 0) + ac_scan(c, 6, 63, 0, True))
    return b"\xff\xd8" + dqt + dri + sof + dht + scans + b"\xff\xd9"


def encode_jpeg_progressive(gray: np.ndarray, quality: int = 90,
                            restart_interval: int = 0) -> bytes:
    """Encode a (h, w) uint8 array as a REAL progressive grayscale JPEG
    (SOF2): spectral selection (DC / AC 1-5 / AC 6-63) crossed with one
    level of successive approximation (first passes at Al=1, refinement
    at Al=0). Decoding all six scans reconstructs exactly the baseline
    quantized coefficients, so :func:`decode_jpeg` output is
    byte-identical to the baseline encoding at the same quality."""
    return _jpeg_assemble_progressive(
        [np.asarray(gray, dtype=np.uint8)], quality, restart_interval)


def encode_jpeg_progressive_420(rgb: np.ndarray,
                                quality: int = 90) -> bytes:
    """Progressive 4:2:0 COLOR JPEG (SOF2 + chroma subsampling — the
    encoding most real web photos ship): interleaved DC scans walk
    16x16 MCUs with four Y blocks + Cb + Cr; AC band scans are
    non-interleaved per component over each component's own raster
    grid (T.81 A.2). :func:`decode_jpeg` reads back the luma plane
    bit-exact to the baseline 4:2:0 encoding of the same pixels."""
    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b),
                0, 255).astype(np.uint8)
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    ph, pw = -h % 2, -w % 2

    def down(p: np.ndarray) -> np.ndarray:
        p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
        q_ = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
        return np.clip(np.round(q_.mean(axis=(1, 3))), 0,
                       255).astype(np.uint8)

    q = _jpeg_qtable(quality)
    mrows, mcols = (h + 15) // 16, (w + 15) // 16
    ypad = np.pad(y, ((0, mrows * 16 - h), (0, mcols * 16 - w)),
                  mode="edge")
    yzz = _jpeg_plane_zz(ypad, q)  # Y raster grid (2mrows x 2mcols)
    czzs = []
    for p_ in (down(cb), down(cr)):
        ppad = np.pad(p_, ((0, mrows * 8 - p_.shape[0]),
                           (0, mcols * 8 - p_.shape[1])), mode="edge")
        czzs.append(_jpeg_plane_zz(ppad, q))
    zzs = [yzz] + czzs
    samps = [(2, 2), (1, 1), (1, 1)]

    dc_codes = _jpeg_build_codes(_JPEG_PROG_DC_BITS, _JPEG_PROG_DC_VALS)
    ac_codes = _jpeg_build_codes(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)

    def dc_scan(al: int, refine: bool) -> bytes:
        # interleaved MCU walk, blocks mapped to each comp's raster
        bw_ = _JpegBitWriter()
        preds = [0, 0, 0]
        for m in range(mrows * mcols):
            mr, mc = divmod(m, mcols)
            for c, (hs, vs) in enumerate(samps):
                gw = mcols * hs
                for vb in range(vs):
                    for hb in range(hs):
                        blk = zzs[c][(mr * vs + vb) * gw
                                     + mc * hs + hb]
                        if refine:
                            bw_.write((int(blk[0]) >> al) & 1, 1)
                            continue
                        t = int(blk[0]) >> al
                        size, bits = _jpeg_magnitude(t - preds[c])
                        code, ln = dc_codes[size]
                        bw_.write(code, ln)
                        if size:
                            bw_.write(bits, size)
                        preds[c] = t
        return bw_.flush()

    def ac_scan(comp: int, ss: int, se: int, al: int,
                refine: bool) -> bytes:
        bw_ = _JpegBitWriter()
        w_ = _ProgAcWriter(bw_, ac_codes)
        for blk in zzs[comp]:
            (_prog_ac_refine if refine else _prog_ac_first)(
                w_, blk, ss, se, al)
        w_.flush_eobrun()
        return bw_.flush()

    def sos_dc(ah: int, al: int) -> bytes:
        return _jpeg_seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00,
                                        0, 0, (ah << 4) | al]))

    def sos_ac(comp: int, ss: int, se: int, ah: int, al: int) -> bytes:
        return _jpeg_seg(0xFFDA, bytes([1, comp + 1, 0x00, ss, se,
                                        (ah << 4) | al]))

    dqt = _jpeg_seg(0xFFDB,
                    b"\x00" + bytes(int(x) for x in q[_JPEG_ZIGZAG]))
    sof = _jpeg_seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 3)
                    + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0])
                    + bytes([3, 0x11, 0]))
    dht = (_jpeg_seg(0xFFC4, b"\x00" + bytes(_JPEG_PROG_DC_BITS)
                     + bytes(_JPEG_PROG_DC_VALS))
           + _jpeg_seg(0xFFC4, b"\x10" + bytes(_JPEG_PROG_AC_BITS)
                       + bytes(_JPEG_PROG_AC_VALS)))
    scans = sos_dc(0, 1) + dc_scan(1, False)
    for c in range(3):
        scans += (sos_ac(c, 1, 5, 0, 1) + ac_scan(c, 1, 5, 1, False)
                  + sos_ac(c, 6, 63, 0, 1) + ac_scan(c, 6, 63, 1, False))
    scans += sos_dc(1, 0) + dc_scan(0, True)
    for c in range(3):
        scans += (sos_ac(c, 1, 5, 1, 0) + ac_scan(c, 1, 5, 0, True)
                  + sos_ac(c, 6, 63, 1, 0) + ac_scan(c, 6, 63, 0, True))
    return b"\xff\xd8" + dqt + sof + dht + scans + b"\xff\xd9"


def encode_jpeg_progressive_color(rgb: np.ndarray,
                                  quality: int = 90) -> bytes:
    """Progressive COLOR JPEG (SOF2, YCbCr 4:4:4): interleaved DC
    scans + per-component AC band scans — exercises the decoder's
    multi-component progressive path; :func:`decode_jpeg` reads back
    the luma plane byte-identical to the baseline color encoding."""
    rgb = np.asarray(rgb, dtype=np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    planes = [np.clip(np.round(p), 0, 255).astype(np.uint8)
              for p in (y, cb, cr)]
    return _jpeg_assemble_progressive(planes, quality)


class _JpegBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("jpeg entropy underrun")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v


def _jpeg_extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Decode a baseline OR progressive (T.81 Annex G: spectral
    selection + successive approximation, Huffman) JPEG to (h, w)
    uint8 gray (luma plane for color; 4:4:4 AND 4:2:0
    chroma-subsampled layouts both decode, baseline AND progressive).
    None for other sampling layouts, arithmetic, lossless/
    hierarchical or corrupt streams -> quarantine."""
    try:
        if payload[:2] != b"\xff\xd8":
            return None
        pos = 2
        qtabs: dict[int, np.ndarray] = {}
        dc_maps: dict[int, dict] = {}
        ac_maps: dict[int, dict] = {}
        frame = None
        restart = 0
        prog_coefs: list[np.ndarray] | None = None
        got_scan = False
        while pos < len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI
                if (frame is not None and frame["prog"] and got_scan
                        and prog_coefs is not None):
                    # all progressive scans folded in -> reconstruct
                    # over the luma component's own grid, crop after
                    c0 = frame["comps"][0]
                    gh = frame["mrows"] * c0["vs"] * 8
                    gw = frame["mcols"] * c0["hs"] * 8
                    full = _jpeg_idct_luma(
                        prog_coefs[0], qtabs[c0["tq"]], gh, gw)
                    return full[:frame["h"], :frame["w"]]
                return None  # EOI before a (complete) scan
            if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
                continue
            (ln,) = struct.unpack_from(">H", payload, pos)
            body = payload[pos + 2:pos + ln]
            pos += ln
            if marker == 0xDB:  # DQT
                b = body
                while b:
                    pq_, tq = b[0] >> 4, b[0] & 15
                    n = 65 if pq_ == 0 else 129
                    raw = (np.frombuffer(b[1:n], np.uint8).astype(np.int64)
                           if pq_ == 0 else
                           np.frombuffer(b[1:n], ">u2").astype(np.int64))
                    tab = np.zeros(64, np.int64)
                    tab[_JPEG_ZIGZAG] = raw
                    qtabs[tq] = tab
                    b = b[n:]
            elif marker == 0xC4:  # DHT
                b = body
                while b:
                    tc, th = b[0] >> 4, b[0] & 15
                    bits = list(b[1:17])
                    nv = sum(bits)
                    vals = list(b[17:17 + nv])
                    (dc_maps if tc == 0 else ac_maps)[th] = \
                        _jpeg_decode_map(bits, vals)
                    b = b[17 + nv:]
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 + SOF2 (prog)
                prec, fh, fw, nc = struct.unpack_from(">BHHB", body)
                if prec != 8:
                    return None
                comps = []
                for c in range(nc):
                    cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                    comps.append({"id": cid, "tq": tq,
                                  "hs": samp >> 4, "vs": samp & 15})
                samps = [(x["hs"], x["vs"]) for x in comps]
                # supported layouts: homogeneous 1x1 (gray / 4:4:4
                # color) and YCbCr 4:2:0 (luma 2x2, chroma 1x1) —
                # baseline AND progressive. Anything else quarantines.
                if not (all(s == (1, 1) for s in samps)
                        or (nc == 3
                            and samps == [(2, 2), (1, 1), (1, 1)])):
                    return None
                frame = {"h": fh, "w": fw, "comps": comps,
                         "prog": marker == 0xC2}
                if frame["prog"]:
                    if fh == 0 or fw == 0:
                        return None
                    # per-component coefficient arrays in COMPONENT
                    # raster order (grids differ under subsampling)
                    hmax = max(x["hs"] for x in comps)
                    vmax = max(x["vs"] for x in comps)
                    mrows = (fh + 8 * vmax - 1) // (8 * vmax)
                    mcols = (fw + 8 * hmax - 1) // (8 * hmax)
                    frame["mrows"], frame["mcols"] = mrows, mcols
                    prog_coefs = [
                        np.zeros((mrows * x["vs"] * mcols * x["hs"],
                                  64), np.int64)
                        for x in comps]
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # lossless / differential / arithmetic
            elif marker == 0xDD:  # DRI
                (restart,) = struct.unpack_from(">H", body)
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                ns = body[0]
                scan = []
                for c in range(ns):
                    cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
                    ci, comp = next(
                        (i_, x) for i_, x in enumerate(frame["comps"])
                        if x["id"] == cs)
                    scan.append({"ci": ci, "tq": comp["tq"],
                                 "td": tabs >> 4, "ta": tabs & 15,
                                 "hs": comp["hs"], "vs": comp["vs"]})
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 15
                # entropy data: everything up to the next real marker,
                # split on restart markers
                segs_, cur = [], bytearray()
                i = pos
                while i < len(payload):
                    b0 = payload[i]
                    if b0 == 0xFF:
                        b1 = payload[i + 1] if i + 1 < len(payload) else 0
                        if b1 == 0x00:
                            cur.append(0xFF)
                            i += 2
                            continue
                        if 0xD0 <= b1 <= 0xD7:
                            segs_.append(bytes(cur))
                            cur = bytearray()
                            i += 2
                            continue
                        break
                    cur.append(b0)
                    i += 1
                segs_.append(bytes(cur))
                if not frame["prog"]:
                    if (ss, se, ah, al) != (0, 63, 0, 0):
                        return None  # malformed sequential scan header
                    if (any(sc["hs"] * sc["vs"] > 1 for sc in scan)
                            and len(scan) != len(frame["comps"])):
                        # non-interleaved scans over a subsampled frame
                        # use component-grid block order — unsupported
                        return None
                    return _jpeg_decode_scan(frame, scan, qtabs, dc_maps,
                                             ac_maps, segs_, restart)
                _jpeg_decode_prog_scan(
                    frame, scan, prog_coefs, dc_maps, ac_maps, segs_,
                    restart, ss, se, ah, al,
                    frame.get("mrows"), frame.get("mcols"))
                got_scan = True
                pos = i  # continue at the next marker
        return None
    except (struct.error, ValueError, IndexError, KeyError,
            StopIteration):
        return None


def _jpeg_huff_read(reader: "_JpegBitReader", table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | reader.read(1)
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _jpeg_decode_scan(frame, scan, qtabs, dc_maps, ac_maps, segs_,
                      restart) -> np.ndarray | None:
    h, w = frame["h"], frame["w"]
    if h == 0 or w == 0:
        return None
    # MCU geometry from the max sampling factors (T.81 A.2.3): 1x1
    # everywhere -> 8x8 MCUs, one block per component; 4:2:0 -> 16x16
    # MCUs, four luma blocks (2x2 raster) + one per chroma.
    hmax = max(sc["hs"] for sc in scan)
    vmax = max(sc["vs"] for sc in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcols, mrows = (w + mcu_w - 1) // mcu_w, (h + mcu_h - 1) // mcu_h
    n_mcu = mrows * mcols
    ncomp = len(scan)
    coefs = [np.zeros((n_mcu * sc["hs"] * sc["vs"], 64), np.int64)
             for sc in scan]
    seg_i = 0
    reader = _JpegBitReader(segs_[0])
    preds = [0] * ncomp
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            seg_i += 1  # RST boundary: byte-align + reset predictors
            if seg_i >= len(segs_):
                return None
            reader = _JpegBitReader(segs_[seg_i])
            preds = [0] * ncomp
        for c, sc in enumerate(scan):
            nb = sc["hs"] * sc["vs"]
            for b in range(nb):  # blocks raster-ordered within the MCU
                blk = coefs[c][m * nb + b]
                size = _jpeg_huff_read(reader, dc_maps[sc["td"]])
                diff = (_jpeg_extend(reader.read(size), size)
                        if size else 0)
                preds[c] += diff
                blk[0] = preds[c]
                k = 1
                while k < 64:
                    sym = _jpeg_huff_read(reader, ac_maps[sc["ta"]])
                    r, s = sym >> 4, sym & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC index overflow")
                    blk[k] = _jpeg_extend(reader.read(s), s)
                    k += 1
    # dequantize + inverse DCT the luma component, vectorized
    sc0 = scan[0]
    if sc0["hs"] == 1 and sc0["vs"] == 1:
        return _jpeg_idct_luma(coefs[0], qtabs[sc0["tq"]], h, w)
    # 2x2 luma: blocks arrive MCU-major (4 per MCU, raster within);
    # reorder to the full-plane raster grid, then the shared IDCT
    hs, vs = sc0["hs"], sc0["vs"]
    grid = np.empty((mrows * vs * mcols * hs, 64), np.int64)
    src_ = coefs[0].reshape(mrows, mcols, vs, hs, 64)
    grid = (src_.transpose(0, 2, 1, 3, 4)
            .reshape(mrows * vs * mcols * hs, 64))
    full = _jpeg_idct_luma(grid, qtabs[sc0["tq"]],
                           mrows * mcu_h, mcols * mcu_w)
    return full[:h, :w]


def _jpeg_decode_prog_scan(frame, scan, coefs, dc_maps, ac_maps, segs_,
                           restart, ss, se, ah, al,
                           mrows=None, mcols=None) -> None:
    """Fold one progressive scan (T.81 G.2 / Annex G decode procedures)
    into the persistent per-component coefficient arrays (COMPONENT
    raster order).

    Four scan kinds: DC first (Ss=0, Ah=0; may be interleaved), DC
    refinement (Ss=0, Ah>0), AC first (Ss>0, Ah=0; single component,
    EOB-run coded), AC refinement (Ss>0, Ah>0; correction bits).
    Interleaved DC scans walk MCUs with h*v blocks per component
    (mapped to each component's raster grid); non-interleaved scans
    (all AC scans, single-component DC) walk the component's own grid
    directly — the T.81 A.2 block-order rules, valid for 1x1 and
    4:2:0 alike.
    """
    interleaved = ss == 0 and len(scan) > 1
    if interleaved:
        n_units = mrows * mcols
    else:
        n_units = coefs[scan[0]["ci"]].shape[0]
    seg_i = 0
    reader = _JpegBitReader(segs_[0])
    eobrun = 0
    preds = [0] * len(scan)

    def dc_one(blk, c, sc):
        nonlocal preds
        if ah == 0:  # first pass: DPCM of point-transformed DC
            size = _jpeg_huff_read(reader, dc_maps[sc["td"]])
            diff = (_jpeg_extend(reader.read(size), size)
                    if size else 0)
            preds[c] += diff
            blk[0] = preds[c] << al
        else:  # refinement: one raw bit
            if reader.read(1):
                blk[0] |= 1 << al

    for m in range(n_units):
        if restart and m and m % restart == 0:
            seg_i += 1  # RST: byte-align, reset predictors + EOB run
            if seg_i >= len(segs_):
                raise ValueError("missing restart segment")
            reader = _JpegBitReader(segs_[seg_i])
            preds = [0] * len(scan)
            eobrun = 0
        if ss == 0:  # DC scan (Se must be 0 per G.1.1.1.1)
            if se != 0:
                raise ValueError("bad DC progressive band")
            if interleaved:
                mr, mc = divmod(m, mcols)
                for c, sc in enumerate(scan):
                    bw_c = mcols * sc["hs"]
                    for vb in range(sc["vs"]):
                        for hb in range(sc["hs"]):
                            idx = ((mr * sc["vs"] + vb) * bw_c
                                   + mc * sc["hs"] + hb)
                            dc_one(coefs[sc["ci"]][idx], c, sc)
            else:
                dc_one(coefs[scan[0]["ci"]][m], 0, scan[0])
            continue
        if len(scan) != 1:
            raise ValueError("interleaved AC progressive scan")
        blk = coefs[scan[0]["ci"]][m]
        amap = ac_maps[scan[0]["ta"]]
        if ah == 0:  # AC first pass (G.1.2.2)
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = _jpeg_huff_read(reader, amap)
                r, s = sym >> 4, sym & 15
                if s:
                    k += r
                    if k > se:
                        raise ValueError("AC band overflow")
                    blk[k] = _jpeg_extend(reader.read(s), s) << al
                    k += 1
                else:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read(r)
                        break
                    k += 16  # ZRL
        else:  # AC refinement pass (G.1.2.3)
            p1, m1 = 1 << al, -(1 << al)
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _jpeg_huff_read(reader, amap)
                    r, s = sym >> 4, sym & 15
                    val = 0
                    if s:
                        if s != 1:
                            raise ValueError("bad refinement size")
                        val = p1 if reader.read(1) else m1
                    elif r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read(r)
                        break  # rest of band handled below
                    # advance over r zero-history positions, folding
                    # correction bits into nonzero-history ones
                    while k <= se:
                        if blk[k]:
                            if reader.read(1) and not (blk[k] & p1):
                                blk[k] += p1 if blk[k] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:  # band remainder: corrections only
                    if blk[k]:
                        if reader.read(1) and not (blk[k] & p1):
                            blk[k] += p1 if blk[k] > 0 else m1
                    k += 1
                eobrun -= 1


def _jpeg_idct_luma(zz_coefs: np.ndarray, q: np.ndarray, h: int,
                    w: int) -> np.ndarray:
    """(n_blocks, 64) zigzag-order int coefficients -> (h, w) uint8."""
    bh, bw = (h + 7) // 8, (w + 7) // 8
    blocks = np.zeros((bh * bw, 64), np.float64)
    blocks[:, _JPEG_ZIGZAG] = zz_coefs  # zigzag -> natural
    blocks *= q  # dequantize in natural order (scattered at DQT parse)
    blocks = blocks.reshape(-1, 8, 8)
    pix = np.einsum("ji,njk,kl->nil", _JPEG_DCT, blocks, _JPEG_DCT)
    pix = np.clip(np.round(pix + 128.0), 0, 255).astype(np.uint8)
    img = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
           .reshape(bh * 8, bw * 8))
    return img[:h, :w]


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """Encode int16 mono samples as a REAL PCM WAV via stdlib wave."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Decode a PCM-16 WAV to (sample_rate, mono int16 samples); multi-
    channel input is averaged down to mono. None when stdlib wave
    refuses the payload (truncated/float/compressed) — quarantined."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            if f.getsampwidth() != 2:
                return None
            sr = f.getframerate()
            n_ch = f.getnchannels()
            raw = f.readframes(f.getnframes())
        # ValueError covers a data chunk truncated mid-sample (frombuffer
        # needs a multiple of 2 bytes) or mid-frame (reshape) — poison
        # bytes quarantine, they never crash the stage (F8)
        samples = np.frombuffer(raw, dtype=np.int16)
        if n_ch > 1:
            samples = (samples.reshape(-1, n_ch).mean(axis=1)
                       .round().astype(np.int16))
        return sr, samples
    except (wave.Error, EOFError, struct.error, ValueError):
        return None


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


_MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def encode_avi(frames: np.ndarray, fps: int = 25, codec: str = "raw",
               quality: int = 90) -> bytes:
    """Encode (n, h, w) uint8 grayscale frames as a REAL AVI — playable
    by any video player. ``codec="raw"``: uncompressed 24-bit BI_RGB
    '00db' DIB frames (BMP-style bottom-up 4-byte-padded rows).
    ``codec="mjpg"``: REAL compressed video — Motion-JPEG, one baseline
    JPEG (:func:`encode_jpeg`) per '00dc' chunk, fcc/biCompression
    'MJPG'. Pure struct/numpy."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    row_bytes = (w * 3 + 3) & ~3

    if codec == "mjpg":
        payloads = [encode_jpeg(f, quality) for f in frames]
        img_size = max(len(p) for p in payloads) if payloads else 0
        handler, comp, tag = b"MJPG", _MJPG_FOURCC, b"00dc"
    elif codec == "raw":
        img_size = row_bytes * h

        def dib(frame: np.ndarray) -> bytes:
            rows = np.zeros((h, row_bytes), dtype=np.uint8)
            rows[:, : w * 3] = np.repeat(frame[::-1], 3, axis=1)
            return rows.tobytes()

        payloads = [dib(f) for f in frames]
        handler, comp, tag = b"DIB ", 0, b"00db"
    else:
        raise ValueError(f"unknown codec {codec!r}")

    avih = struct.pack("<14I", 1_000_000 // fps, img_size * fps, 0, 0x10,
                       n, 0, 1, img_size, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIi4H", b"vids", handler, 0, 0, 0,
                       0, 1, fps, 0, n, img_size, 0, 0, 0, 0,
                       w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, comp, img_size,
                       2835, 2835, 0, 0)
    strl = _riff_chunk(b"LIST", b"strl" + _riff_chunk(b"strh", strh)
                       + _riff_chunk(b"strf", strf))
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih)
                       + strl)
    movi = _riff_chunk(b"LIST", b"movi" + b"".join(
        _riff_chunk(tag, p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[float, np.ndarray] | None:
    """Decode an uncompressed 24-bit DIB AVI or a Motion-JPEG AVI to
    (fps, (n, h, w) uint8 gray frames). Returns None for variants this
    decoder doesn't cover (other codecs, non-24-bit, truncated, frames
    disagreeing with the header geometry) — callers quarantine those
    rows."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            return None
        w = h = None
        scale = rate = None
        mode = ["raw"]

        def walk(lo: int, hi: int):
            nonlocal w, h, scale, rate
            frames = []
            pos = lo
            while pos + 8 <= hi:
                tag = payload[pos:pos + 4]
                ln = struct.unpack_from("<I", payload, pos + 4)[0]
                body_lo = pos + 8
                if body_lo + ln > hi:
                    raise ValueError("truncated chunk")
                if tag == b"LIST":
                    frames += walk(body_lo + 4, body_lo + ln)
                elif tag == b"strh":
                    if payload[body_lo:body_lo + 4] == b"vids":
                        scale, rate = struct.unpack_from(
                            "<II", payload, body_lo + 20)
                elif tag == b"strf":
                    (_sz, bw, bh, _pl, bpp, comp) = struct.unpack_from(
                        "<IiiHHI", payload, body_lo)
                    if (bpp != 24 or comp not in (0, _MJPG_FOURCC)
                            or bw <= 0 or bh <= 0):
                        raise ValueError("unsupported stream format")
                    w, h = bw, bh
                    mode[0] = "mjpg" if comp == _MJPG_FOURCC else "raw"
                elif tag in (b"00db", b"00dc"):
                    frames.append((body_lo, ln))
                pos = body_lo + ln + (ln & 1)
            return frames

        raw = walk(12, 8 + struct.unpack_from("<I", payload, 4)[0])
        if w is None or not raw:
            return None
        out = np.empty((len(raw), h, w), dtype=np.uint8)
        if mode[0] == "mjpg":
            for i, (lo, ln) in enumerate(raw):
                img = decode_jpeg(payload[lo:lo + ln])
                if img is None or img.shape != (h, w):
                    return None  # bad frame or header mismatch
                out[i] = img
        else:
            row_bytes = (w * 3 + 3) & ~3
            for i, (lo, ln) in enumerate(raw):
                if ln < row_bytes * h:
                    return None
                rows = np.frombuffer(payload, np.uint8, row_bytes * h,
                                     lo).reshape(h, row_bytes)
                out[i] = rows[::-1, : w * 3 : 3]
        fps = (rate / scale) if scale and rate else 0.0
        return fps, out
    except (struct.error, ValueError):
        return None


def fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image container: header + seeded pixel bytes."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return _IMG_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


def fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    samples = (rng.standard_normal(n_samples) * 1000).astype(np.int16)
    return _AUD_MAGIC + struct.pack("<II", sample_rate, n_samples) + samples.tobytes()


def fake_video(width: int, height: int, n_frames: int, fps: int = 25,
               seed: int = 0) -> bytes:
    """Deterministic fake video container: header + seeded frame bytes."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=n_frames * width * height,
                          dtype=np.uint8)
    return (_VID_MAGIC + struct.pack("<IIII", width, height, n_frames, fps)
            + frames.tobytes())


class FrameSampleStage:
    """binary video -> one row per sampled frame, as image bytes.

    The flat-map analog for video: each input row explodes into
    ``ceil(n_frames / every)`` frame rows carrying ``(frame_idx,
    frame_ts_s, frame)``. REAL uncompressed AVI (RIFF ``AVI ``, DIB
    frames) decodes first and emits its sampled frames as REAL BMPs;
    the fake container emits fake-image bytes — either way the frame
    column is decodable by the downstream image stages. Compressed
    video (ffmpeg/pyav) is not in this container.
    """

    def __init__(self, every: int = 10, video_col: str = "video",
                 id_col: str = "vid_id"):
        if every <= 0:
            raise ValueError("every must be positive")
        self.every, self.video_col, self.id_col = every, video_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids, out_idx, out_ts, out_frames = [], [], [], []
        ids = batch[self.id_col].to_pylist()
        for vid, payload in zip(ids, batch[self.video_col].to_pylist()):
            if payload and payload[:4] == b"RIFF" \
                    and payload[8:12] == b"AVI ":
                decoded = decode_avi(payload)
                if decoded is None:
                    continue  # undecodable AVI -> quarantined
                fps_f, avi_frames = decoded
                for i in range(0, len(avi_frames), self.every):
                    out_ids.append(vid)
                    out_idx.append(i)
                    out_ts.append(round(i / fps_f, 6) if fps_f else 0.0)
                    out_frames.append(encode_bmp(avi_frames[i]))
                continue
            if not (payload and payload[:8] == _VID_MAGIC):
                continue  # undecodable -> quarantined (F8 semantics)
            w, h, n_frames, fps = struct.unpack_from("<IIII", payload, 8)
            frames = np.frombuffer(payload, dtype=np.uint8, offset=24)
            frames = frames.reshape(n_frames, h * w)
            for i in range(0, n_frames, self.every):
                out_ids.append(vid)
                out_idx.append(i)
                out_ts.append(round(i / fps, 6) if fps else 0.0)
                out_frames.append(
                    _IMG_MAGIC + struct.pack("<II", w, h) + frames[i].tobytes()
                )
        return pa.table(
            {
                self.id_col: pa.array(out_ids),
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "frame_ts_s": pa.array(out_ts, type=pa.float64()),
                "frame": pa.array(out_frames, type=pa.large_binary()),
            }
        )


def _image_gray(payload: bytes | None) -> np.ndarray | None:
    """Sniff-and-decode an image payload to a (h, w) uint8 gray array:
    real BMP first, then the fake container. None -> quarantine."""
    if not payload:
        return None
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:4] == b"GIF8":
        return decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:8] == _IMG_MAGIC:
        w, h = struct.unpack_from("<II", payload, 8)
        pixels = np.frombuffer(payload, dtype=np.uint8, offset=16)
        if w * h == 0 or len(pixels) != w * h:
            return None  # zero-dim or truncated container -> quarantine
        return pixels.reshape(h, w)
    return None


def _audio_mono(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """Sniff-and-decode an audio payload to (sample_rate, int16 mono):
    real WAV first, then the fake container. None -> quarantine."""
    if not payload:
        return None
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:8] == _AUD_MAGIC:
        sr, n = struct.unpack_from("<II", payload, 8)
        samples = np.frombuffer(payload, dtype=np.int16, offset=16)
        return (sr, samples) if len(samples) == n else None
    return None


class DecodeImageStage:
    """binary image -> (width, height, checksum, mean_pixel).

    Decodes REAL baseline JPEG, PNG, GIF89a and uncompressed BMP
    (stdlib + numpy) plus the fake container.
    ``require_real_codecs=True`` is where PIL would extend coverage to
    progressive / chroma-subsampled JPEG; in this container that
    raises ``NotImplementedError`` (clearly marked stub). The checksum
    is the crc32 of the decoded top-down gray pixel buffer, so a BMP
    and a fake container carrying the same pixels hash identically.
    """

    def __init__(self, image_col: str = "image", require_real_codecs: bool = False):
        if require_real_codecs:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "PIL is not available in this container; baseline "
                    "JPEG, PNG, GIF, BMP and the deterministic fake "
                    "container decode without it (progressive/subsampled "
                    "JPEG would need PIL)"
                ) from exc
        self.image_col = image_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, checksums, means = [], [], [], []
        for payload in batch[self.image_col].to_pylist():
            gray = _image_gray(payload)
            if gray is not None:
                h, w = gray.shape
                widths.append(w)
                heights.append(h)
                checksums.append(zlib.crc32(np.ascontiguousarray(gray).tobytes()))
                means.append(float(gray.mean()) if gray.size else 0.0)
            else:  # undecodable -> quarantine row (F8 semantics)
                widths.append(None)
                heights.append(None)
                checksums.append(None)
                means.append(None)
        out = batch.drop_columns([self.image_col])
        out = out.append_column("width", pa.array(widths, type=pa.int32()))
        out = out.append_column("height", pa.array(heights, type=pa.int32()))
        out = out.append_column("checksum", pa.array(checksums, type=pa.int64()))
        out = out.append_column("mean_pixel", pa.array(means, type=pa.float64()))
        return out


class ResizeImageStage:
    """binary image -> binary image at (out_w, out_h), nearest-neighbor.
    Output stays in the INPUT's wire format (BMP in -> BMP out, fake in
    -> fake out) so downstream decode stages compose either way."""

    def __init__(self, out_w: int, out_h: int, image_col: str = "image"):
        self.out_w, self.out_h, self.image_col = out_w, out_h, image_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = []
        for payload in batch[self.image_col].to_pylist():
            gray = _image_gray(payload)
            if gray is None:
                resized.append(None)
                continue
            h, w = gray.shape
            ys = (np.arange(self.out_h) * h // self.out_h)
            xs = (np.arange(self.out_w) * w // self.out_w)
            small = gray[np.ix_(ys, xs)]
            if payload[:2] == b"BM":
                resized.append(encode_bmp(small))
            elif payload[:2] == b"\xff\xd8":
                resized.append(encode_jpeg(small))
            else:
                resized.append(
                    _IMG_MAGIC
                    + struct.pack("<II", self.out_w, self.out_h)
                    + small.tobytes()
                )
        idx = batch.column_names.index(self.image_col)
        return batch.set_column(
            idx, self.image_col, pa.array(resized, type=pa.large_binary())
        )


class AudioFeatureStage:
    """binary audio -> (sample_rate, n_samples, duration_s, rms).
    Decodes REAL PCM WAV (stdlib wave) and the fake container."""

    def __init__(self, audio_col: str = "audio"):
        self.audio_col = audio_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, counts, durations, rms = [], [], [], []
        for payload in batch[self.audio_col].to_pylist():
            decoded = _audio_mono(payload)
            if decoded is not None:
                sr, samples = decoded
                n = len(samples)
                rates.append(sr)
                counts.append(n)
                durations.append(round(n / sr, 6) if sr else 0.0)
                rms.append(
                    round(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))), 6)
                    if n else 0.0
                )
            else:
                rates.append(None)
                counts.append(None)
                durations.append(None)
                rms.append(None)
        out = batch.drop_columns([self.audio_col])
        out = out.append_column("sample_rate", pa.array(rates, type=pa.int32()))
        out = out.append_column("n_samples", pa.array(counts, type=pa.int64()))
        out = out.append_column("duration_s", pa.array(durations, type=pa.float64()))
        out = out.append_column("rms", pa.array(rms, type=pa.float64()))
        return out


class PerceptualHashStage:
    """binary image -> 64-bit average-hash (aHash) for near-duplicate
    detection — the image twin of the text MinHash family: decode
    (real BMP or the fake container, same sniff order as
    ``DecodeImageStage``), crop to 8x8 blocks, and set bit i when
    ``64 * block_sum_i > total_sum`` — an exact integer comparison, so
    the hash is bit-identical across formats carrying the same pixels
    and across cluster layouts. Images smaller than 8x8 and
    undecodable payloads quarantine (None). The hash rides an int64
    column (the uint64 bit pattern two's-complemented), so downstream
    grouping is a plain integer groupby."""

    def __init__(self, image_col: str = "image"):
        self.image_col = image_col

    @staticmethod
    def _ahash(gray: np.ndarray) -> int | None:
        h, w = gray.shape
        if h < 8 or w < 8:
            return None
        bh, bw = h // 8, w // 8
        crop = gray[:bh * 8, :bw * 8].astype(np.int64)
        blocks = crop.reshape(8, bh, 8, bw).sum(axis=(1, 3))
        total = int(blocks.sum())
        bits = (64 * blocks.reshape(-1) > total)
        return int(np.uint64(
            np.packbits(bits.astype(np.uint8)).view(">u8")[0]
        ).astype(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for payload in batch[self.image_col].to_pylist():
            gray = _image_gray(payload)
            hashes.append(None if gray is None else self._ahash(gray))
        out = batch.drop_columns([self.image_col])
        return out.append_column("phash", pa.array(hashes, pa.int64()))
