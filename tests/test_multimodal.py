"""Multimodal plumbing: fake-container decode, resize, audio features."""

import pyarrow as pa
import pytest
import ray.data as rd

from bitquery_kafka_streams_rust_ray.stages.multimodal import (
    AudioFeatureStage,
    DecodeImageStage,
    ResizeImageStage,
    fake_audio,
    fake_image,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_decode_image_batch():
    t = pa.table(
        {
            "img_id": [1, 2, 3],
            "image": [fake_image(8, 4, seed=1), fake_image(16, 16, seed=2),
                      b"not an image"],
        }
    )
    out = DecodeImageStage(image_col="image")(t)
    assert out["width"].to_pylist() == [8, 16, None]
    assert out["height"].to_pylist() == [4, 16, None]
    assert out["checksum"].to_pylist()[2] is None
    assert "image" not in out.column_names


def test_decode_requires_real_codecs_raises():
    with pytest.raises(NotImplementedError):
        DecodeImageStage(require_real_codecs=True)


def test_resize_image():
    t = pa.table({"image": [fake_image(16, 16, seed=3)]})
    out = ResizeImageStage(4, 4)(t)
    decoded = DecodeImageStage()(out)
    assert decoded["width"].to_pylist() == [4]
    assert decoded["height"].to_pylist() == [4]


def test_audio_features():
    t = pa.table({"audio": [fake_audio(16000, 32000, seed=4), b"junk"]})
    out = AudioFeatureStage()(t)
    assert out["sample_rate"].to_pylist() == [16000, None]
    assert out["duration_s"].to_pylist()[0] == 2.0
    assert out["rms"].to_pylist()[0] > 0


def test_pipeline_through_ray():
    rows = [{"img_id": i, "image": fake_image(8, 8, seed=i)} for i in range(20)]
    ds = rd.from_items(rows)
    out = ds.map_batches(
        DecodeImageStage, fn_constructor_kwargs={"image_col": "image"},
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2),
    ).to_pandas()
    assert len(out) == 20
    assert (out["width"] == 8).all()


def test_frame_sample_explodes_and_composes():
    from bitquery_kafka_streams_rust_ray.stages.multimodal import FrameSampleStage, fake_video

    t = pa.table({
        "vid_id": [1, 2],
        "video": [fake_video(6, 4, n_frames=25, fps=25, seed=7), b"junk"],
    })
    frames = FrameSampleStage(every=10)(t)
    # 25 frames sampled every 10 -> indices 0, 10, 20; junk row quarantined
    assert frames["vid_id"].to_pylist() == [1, 1, 1]
    assert frames["frame_idx"].to_pylist() == [0, 10, 20]
    assert frames["frame_ts_s"].to_pylist() == [0.0, 0.4, 0.8]
    # sampled frames are decodable fake images -> image stages compose
    decoded = DecodeImageStage(image_col="frame")(frames)
    assert decoded["width"].to_pylist() == [6, 6, 6]
    assert decoded["height"].to_pylist() == [4, 4, 4]


def test_frame_sample_through_ray_flat_map():
    from bitquery_kafka_streams_rust_ray.stages.multimodal import FrameSampleStage, fake_video

    rows = [{"vid_id": i, "video": fake_video(4, 4, n_frames=12, seed=i)}
            for i in range(6)]
    out = (
        rd.from_items(rows)
        .map_batches(FrameSampleStage, fn_constructor_kwargs={"every": 5},
                     batch_format="pyarrow", batch_size=2, concurrency=(1, 2))
        .to_pandas()
    )
    # 12 frames every 5 -> 3 rows per video
    assert len(out) == 18


# --- real wire formats (BMP via struct, WAV via stdlib wave) -------------


def test_bmp_roundtrip_through_decode_stage():
    """A REAL uncompressed 24-bit BMP decodes through DecodeImageStage
    with the same features as a fake container carrying the same
    pixels (format-independent checksum)."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import encode_bmp

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(6, 10), dtype=np.uint8)  # w=10, h=6
    bmp = encode_bmp(gray)
    assert bmp[:2] == b"BM"  # genuine BMP magic, viewable wire format
    fake = (b"FAKEIMG1"
            + __import__("struct").pack("<II", 10, 6) + gray.tobytes())
    t = pa.table({"image": [bmp, fake]})
    out = DecodeImageStage()(t)
    assert out["width"].to_pylist() == [10, 10]
    assert out["height"].to_pylist() == [6, 6]
    assert out["checksum"].to_pylist()[0] == out["checksum"].to_pylist()[1]
    assert out["mean_pixel"].to_pylist()[0] == pytest.approx(float(gray.mean()))


def test_bmp_resize_stays_bmp_and_composes():
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_bmp, encode_bmp)

    gray = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = ResizeImageStage(4, 4)(pa.table({"image": [encode_bmp(gray)]}))
    payload = out["image"].to_pylist()[0]
    assert payload[:2] == b"BM"  # format preserved
    small = decode_bmp(payload)
    assert small.shape == (4, 4)
    # nearest-neighbor on this gradient: top-left pixel survives
    assert small[0, 0] == gray[0, 0]
    decoded = DecodeImageStage()(out)
    assert decoded["width"].to_pylist() == [4]


def test_wav_roundtrip_through_audio_stage():
    """A REAL PCM WAV (stdlib wave) yields the same features as the
    fake container carrying the same samples."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import encode_wav

    rng = np.random.default_rng(12)
    samples = (rng.standard_normal(8000) * 1000).astype(np.int16)
    wav = encode_wav(16000, samples)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    fake = (b"FAKEAUD1"
            + __import__("struct").pack("<II", 16000, 8000)
            + samples.tobytes())
    out = AudioFeatureStage()(pa.table({"audio": [wav, fake]}))
    assert out["sample_rate"].to_pylist() == [16000, 16000]
    assert out["n_samples"].to_pylist() == [8000, 8000]
    assert out["rms"].to_pylist()[0] == out["rms"].to_pylist()[1]
    assert out["duration_s"].to_pylist()[0] == 0.5


def test_stereo_wav_downmixes_to_mono():
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_wav, encode_wav)

    left = np.full(100, 1000, dtype=np.int16)
    # interleave L/R manually: stereo frames via raw wave write
    import io
    import wave as wv

    buf = io.BytesIO()
    with wv.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        inter = np.empty(200, dtype=np.int16)
        inter[0::2] = left
        inter[1::2] = -left
        f.writeframes(inter.tobytes())
    sr, mono = decode_wav(buf.getvalue())
    assert sr == 8000 and len(mono) == 100
    assert abs(int(mono.mean())) <= 1  # L/R cancel


def test_truncated_real_payloads_quarantine():
    """Torn BMP/WAV bytes must land in the quarantine (null) rows, not
    crash the stage — F8 poison semantics on real formats too."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        encode_bmp, encode_wav)

    gray = np.zeros((8, 8), dtype=np.uint8)
    bmp = encode_bmp(gray)
    wav = encode_wav(8000, np.zeros(100, dtype=np.int16))
    out_i = DecodeImageStage()(pa.table({"image": [bmp[:30], bmp[:60]]}))
    assert out_i["width"].to_pylist() == [None, None]
    out_a = AudioFeatureStage()(pa.table({"audio": [wav[:10]]}))
    assert out_a["sample_rate"].to_pylist() == [None]


def test_wav_truncated_mid_sample_quarantines():
    """An odd-byte truncation inside the data chunk makes frombuffer
    raise ValueError — it must quarantine, not crash the stage."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import encode_wav

    wav = encode_wav(8000, np.zeros(100, dtype=np.int16))
    out = AudioFeatureStage()(pa.table({"audio": [wav[:-1]]}))
    assert out["sample_rate"].to_pylist() == [None]


def test_zero_dim_images_quarantine_through_resize():
    """A zero-height BMP or zero-dim fake container is poison: both
    decode AND resize must emit null rows, not crash (reviewer
    finding: a (0, w) array survived decode and crashed np.ix_)."""
    import struct as st

    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import encode_bmp

    bmp = bytearray(encode_bmp(np.zeros((4, 4), dtype=np.uint8)))
    st.pack_into("<i", bmp, 22, 0)  # height := 0
    fake0 = b"FAKEIMG1" + st.pack("<II", 0, 0)
    t = pa.table({"image": [bytes(bmp), fake0]})
    out = DecodeImageStage()(t)
    assert out["width"].to_pylist() == [None, None]
    rt = ResizeImageStage(2, 2)(t)
    assert rt["image"].to_pylist() == [None, None]


def test_phash_cross_format_dedup():
    """Average-hash groups span wire formats: each part-key triple
    carries one real BMP + two fake containers with identical pixels,
    so every shipped duplicate group has 2-3 members and the triple
    (3, 4, 5) collapses to one hash; a truncated BMP quarantines."""
    import numpy as np
    import pyarrow as pa

    from bitquery_kafka_streams_rust_ray.pipelines.queries import phash_dedup_images
    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        PerceptualHashStage, encode_bmp)

    out = phash_dedup_images("/root/testdata/sf0.001")
    assert len(out) > 0
    assert set(out["n"].unique()) <= {2, 3}
    assert (out["n"] == 3).sum() > (out["n"] == 2).sum()

    # direct stage checks: identical pixels across formats, quarantine
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, size=(9, 10), dtype=np.uint8)
    bmp = encode_bmp(px)
    stage = PerceptualHashStage()
    t = pa.table({"img_id": pa.array([1, 2, 3], pa.int64()),
                  "image": pa.array([bmp, bmp, bmp[:20]], pa.binary())})
    got = stage(t)
    h = got["phash"].to_pylist()
    assert h[0] == h[1] and h[0] is not None
    assert h[2] is None  # truncated -> quarantine


def test_gif_roundtrip_and_lzw_resets():
    """REAL single-frame GIF89a: variable-width LZW round-trips exactly,
    including images large/repetitive enough to force 4096-entry table
    resets; truncated and interlaced payloads quarantine (None)."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_gif, encode_gif)

    rng = np.random.default_rng(3)
    for shape in [(1, 1), (7, 13), (64, 64)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        b = encode_gif(img)
        assert b[:6] == b"GIF89a"
        assert np.array_equal(decode_gif(b), img)
    # constant 500x500 = 250k identical pixels: maximal dictionary
    # growth -> multiple clear-code resets on both sides
    img = np.full((500, 500), 77, np.uint8)
    b = encode_gif(img)
    assert len(b) < 5000  # LZW actually compressed
    assert np.array_equal(decode_gif(b), img)
    assert decode_gif(b[:200]) is None
    # interlace flag set -> unsupported -> quarantine, not garbage
    ib = bytearray(encode_gif(np.zeros((4, 4), np.uint8)))
    desc = 13 + 256 * 3  # header+LSD+global palette -> image descriptor
    assert ib[desc] == 0x2C
    ib[desc + 9] |= 0x40
    assert decode_gif(bytes(ib)) is None


def test_gif_decodes_through_stage_like_bmp_and_fake():
    """The same pixels as GIF, BMP and fake container produce identical
    format-independent checksums through DecodeImageStage."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        encode_bmp, encode_gif)

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(6, 10), dtype=np.uint8)
    fake = (b"FAKEIMG1"
            + __import__("struct").pack("<II", 10, 6) + gray.tobytes())
    t = pa.table({"image": [encode_gif(gray), encode_bmp(gray), fake]})
    out = DecodeImageStage()(t)
    assert out["width"].to_pylist() == [10, 10, 10]
    cks = out["checksum"].to_pylist()
    assert cks[0] == cks[1] == cks[2]


def test_png_roundtrip_all_filters_and_crc():
    """REAL 8-bit grayscale PNG: encode/decode round-trips; a hand-built
    IDAT cycling ALL FIVE scanline filters (None/Sub/Up/Average/Paeth)
    decodes to the exact pixels; CRC corruption and truncation
    quarantine (None)."""
    import struct
    import zlib

    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        _PNG_SIG, _png_chunk, decode_png, encode_png)

    rng = np.random.default_rng(5)
    for shape in [(1, 1), (3, 5), (40, 60)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        b = encode_png(img)
        assert b[:8] == _PNG_SIG
        assert np.array_equal(decode_png(b), img)

    img = (np.add.outer(np.arange(9), np.arange(7)) * 13 % 256
           ).astype(np.uint8)
    h, w = img.shape
    rows = []
    prev = np.zeros(w, np.int32)
    for y in range(h):
        f = y % 5
        line = img[y].astype(np.int32)
        enc = np.zeros(w, np.uint8)
        for x in range(w):
            ul = int(prev[x - 1]) if x else 0
            u = int(prev[x])
            lf = int(img[y, x - 1]) if x else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = lf
            elif f == 2:
                pred = u
            elif f == 3:
                pred = (lf + u) >> 1
            else:
                p = lf + u - ul
                pa_, pb, pcd = abs(p - lf), abs(p - u), abs(p - ul)
                pred = (lf if pa_ <= pb and pa_ <= pcd
                        else u if pb <= pcd else ul)
            enc[x] = (int(line[x]) - pred) & 0xFF
        rows.append(bytes([f]) + enc.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), img)

    bad = bytearray(encode_png(img))
    bad[40] ^= 0xFF
    assert decode_png(bytes(bad)) is None
    assert decode_png(encode_png(img)[:30]) is None


def test_png_decodes_through_stage():
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        encode_bmp, encode_png)

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(6, 10), dtype=np.uint8)
    t = pa.table({"image": [encode_png(gray), encode_bmp(gray)]})
    out = DecodeImageStage()(t)
    assert out["width"].to_pylist() == [10, 10]
    cks = out["checksum"].to_pylist()
    assert cks[0] == cks[1]


def test_avi_roundtrip_and_frame_sampling():
    """REAL uncompressed AVI (RIFF, DIB frames): encode/decode
    round-trips exactly; FrameSampleStage samples its frames as REAL
    BMPs that compose with DecodeImageStage; truncated payloads
    quarantine. Every modality now has a real wire format."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        FrameSampleStage, decode_avi, decode_bmp, encode_avi)

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(12, 6, 10), dtype=np.uint8)
    avi = encode_avi(frames, fps=30)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    fps, got = decode_avi(avi)
    assert fps == 30.0 and np.array_equal(got, frames)
    assert decode_avi(avi[:80]) is None

    t = pa.table({"vid_id": ["v1"], "video": [avi]})
    out = FrameSampleStage(every=5)(t)
    assert out["frame_idx"].to_pylist() == [0, 5, 10]
    assert out["frame_ts_s"].to_pylist() == [0.0, round(5 / 30, 6),
                                             round(10 / 30, 6)]
    for i, fb in zip((0, 5, 10), out["frame"].to_pylist()):
        assert fb[:2] == b"BM"  # sampled frames are real BMPs
        assert np.array_equal(decode_bmp(fb), frames[i])
    dec = DecodeImageStage()(out.rename_columns(
        ["vid_id", "frame_idx", "frame_ts_s", "image"]))
    assert dec["width"].to_pylist() == [10, 10, 10]


from hypothesis import given, settings, strategies as hst


@settings(deadline=None)
@given(
    w=hst.integers(min_value=1, max_value=40),
    h=hst.integers(min_value=1, max_value=40),
    seed=hst.integers(min_value=0, max_value=2**31),
    flavor=hst.sampled_from(["random", "constant", "gradient", "binary"]),
)
def test_image_codec_roundtrip_property(w, h, seed, flavor):
    """Every real image/video codec is an exact round-trip for
    arbitrary shapes and pixel structures (random, constant = maximal
    LZW dictionary reuse, gradient = filter-friendly, binary = long
    runs)."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_avi, decode_bmp, decode_gif, decode_png, encode_avi,
        encode_bmp, encode_gif, encode_png)

    rng = np.random.default_rng(seed)
    if flavor == "random":
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    elif flavor == "constant":
        img = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
    elif flavor == "gradient":
        img = (np.add.outer(np.arange(h), np.arange(w)) % 256
               ).astype(np.uint8)
    else:
        img = (rng.random((h, w)) < 0.1).astype(np.uint8) * 255
    assert np.array_equal(decode_png(encode_png(img)), img)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    frames = np.stack([img, 255 - img])
    fps, got = decode_avi(encode_avi(frames, fps=10))
    assert fps == 10.0 and np.array_equal(got, frames)


def _jpeg_math_reference(img, quality):
    """Quantize-reconstruct math the codec must match EXACTLY (the
    entropy layer is lossless, so any deviation is a codec bug)."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        _JPEG_DCT, _jpeg_qtable)

    h, w = img.shape
    q = _jpeg_qtable(quality).reshape(8, 8)
    ph, pw = -h % 8, -w % 8
    im = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    im -= 128.0
    bh, bw = im.shape[0] // 8, im.shape[1] // 8
    blocks = (im.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8))
    coef = np.einsum("ij,njk,lk->nil", _JPEG_DCT, blocks, _JPEG_DCT)
    rec = np.einsum("ji,njk,kl->nil", _JPEG_DCT,
                    np.round(coef / q) * q, _JPEG_DCT)
    pix = np.clip(np.round(rec + 128.0), 0, 255).astype(np.uint8)
    return (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)[:h, :w])


@settings(deadline=None)
@given(
    w=hst.integers(min_value=1, max_value=40),
    h=hst.integers(min_value=1, max_value=40),
    seed=hst.integers(min_value=0, max_value=2**31),
    quality=hst.sampled_from([25, 50, 75, 90, 95]),
    flavor=hst.sampled_from(["random", "constant", "gradient", "binary"]),
)
def test_jpeg_codec_matches_quantization_math(w, h, seed, quality, flavor):
    """REAL baseline JPEG: decode(encode(img)) equals the pure
    quantize-reconstruct DCT math bit-for-bit — Huffman, zigzag, byte
    stuffing, DC prediction, EOB/ZRL runs are all exercised and must be
    transparent."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_jpeg, encode_jpeg)

    rng = np.random.default_rng(seed)
    if flavor == "random":
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    elif flavor == "constant":
        img = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
    elif flavor == "gradient":
        img = (np.add.outer(np.arange(h), np.arange(w)) % 256
               ).astype(np.uint8)
    else:
        img = (rng.random((h, w)) < 0.1).astype(np.uint8) * 255
    payload = encode_jpeg(img, quality)
    got = decode_jpeg(payload)
    assert got is not None and got.shape == (h, w)
    assert np.array_equal(got, _jpeg_math_reference(img, quality))


def test_jpeg_quarantine_paths():
    """Truncated / garbage / progressive / chroma-subsampled payloads
    return None (quarantine), and bit flips never raise."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_jpeg, encode_jpeg)

    img = (np.add.outer(np.arange(24), np.arange(32)) % 256).astype(
        np.uint8)
    payload = encode_jpeg(img, 90)
    assert decode_jpeg(payload[: len(payload) // 2]) is None
    assert decode_jpeg(b"\xff\xd8not a jpeg at all") is None
    assert decode_jpeg(b"") is None
    # SOF0 -> SOF2 with a BASELINE scan header (Ss=0, Se=63 — illegal
    # for progressive, G.1.1.1.1) must be rejected, not misparsed
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(prog) is None
    # sampling factor 2x2 (chroma-subsampling layout) -> unsupported
    sof = payload.index(b"\xff\xc0")
    sub = bytearray(payload)
    assert sub[sof + 11] == 0x11  # sampling byte of component 1
    sub[sof + 11] = 0x22
    assert decode_jpeg(bytes(sub)) is None
    # arbitrary bit flips: None or a decoded array, never an exception
    for pos in range(len(payload) - 40, len(payload) - 4, 7):
        bad = bytearray(payload)
        bad[pos] ^= 0x2A
        out = decode_jpeg(bytes(bad))
        assert out is None or isinstance(out, np.ndarray)


def test_jpeg_through_decode_and_resize_stages(ray_session):
    """JPEG payloads flow through the sniffing decode stage, and
    ResizeImageStage re-encodes JPEG-in as JPEG-out."""
    import numpy as np
    import pyarrow as pa

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        DecodeImageStage, ResizeImageStage, decode_jpeg, encode_jpeg)

    img = ((np.add.outer(np.arange(17), np.arange(23)) * 3) % 256
           ).astype(np.uint8)
    t = pa.table({"img_id": [1], "image": [encode_jpeg(img, 90)]})
    dec = DecodeImageStage(image_col="image")(t)
    assert dec["width"][0].as_py() == 23
    assert dec["height"][0].as_py() == 17
    assert dec["checksum"][0].as_py() is not None
    rs = ResizeImageStage(8, 8, image_col="image")(t)
    payload = rs["image"][0].as_py()
    assert payload[:2] == b"\xff\xd8"  # stayed JPEG on the wire
    out = decode_jpeg(payload)
    assert out is not None and out.shape == (8, 8)


@settings(deadline=None, max_examples=40)
@given(
    w=hst.integers(min_value=1, max_value=24),
    h=hst.integers(min_value=1, max_value=24),
    n=hst.integers(min_value=1, max_value=6),
    seed=hst.integers(min_value=0, max_value=2**31),
    quality=hst.sampled_from([50, 75, 90]),
)
def test_mjpeg_avi_matches_per_frame_jpeg(w, h, n, seed, quality):
    """REAL Motion-JPEG AVI: decode equals the per-frame baseline-JPEG
    decode exactly (the container adds nothing lossy), and the header
    geometry gates frame acceptance."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_avi, decode_jpeg, encode_avi, encode_jpeg)

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    payload = encode_avi(frames, fps=12, codec="mjpg", quality=quality)
    fps, got = decode_avi(payload)
    assert fps == 12.0 and got.shape == (n, h, w)
    ref = np.stack([decode_jpeg(encode_jpeg(f, quality)) for f in frames])
    assert np.array_equal(got, ref)


def test_mjpeg_avi_through_frame_sampler(ray_session):
    """A compressed (MJPG) AVI flows through FrameSampleStage exactly
    like an uncompressed one; corrupt frames quarantine the row."""
    import numpy as np
    import pyarrow as pa

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        FrameSampleStage, decode_avi, encode_avi)

    frames = np.stack([
        ((np.add.outer(np.arange(12), np.arange(16)) * k) % 256
         ).astype(np.uint8) for k in range(1, 11)
    ])
    good = encode_avi(frames, fps=10, codec="mjpg")
    bad = bytearray(good)
    bad[-40] ^= 0x3C  # flip a bit inside the last JPEG frame chunk
    t = pa.table({"vid_id": [1, 2],
                  "video": [good, bytes(bad)]})
    out = FrameSampleStage(every=4)(t)
    vids = out["vid_id"].to_pylist()
    # the corrupt row either quarantines (no frames) or decodes — but
    # the good row MUST yield ceil(10/4)=3 sampled frames
    assert vids.count(1) == 3
    ref = decode_avi(good)[1]
    from bitquery_kafka_streams_rust_ray.stages.multimodal import decode_bmp
    got0 = decode_bmp(out["frame"][0].as_py())
    assert np.array_equal(got0, ref[0])


@settings(deadline=None, max_examples=120)
@given(data=hst.binary(min_size=0, max_size=400),
       seed=hst.integers(min_value=0, max_value=2**31))
def test_jpeg_decoder_never_raises_on_garbage(data, seed):
    """decode_jpeg is total: arbitrary bytes — raw, SOI-prefixed, or a
    valid JPEG with a random slice spliced in — return an array or
    None, never an exception (the F8 quarantine contract)."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_jpeg, encode_jpeg)

    for payload in (data, b"\xff\xd8" + data):
        out = decode_jpeg(payload)
        assert out is None or isinstance(out, np.ndarray)
    rng = np.random.default_rng(seed)
    base = bytearray(encode_jpeg(
        rng.integers(0, 256, size=(9, 11), dtype=np.uint8)))
    if data:
        pos = int(rng.integers(2, max(3, len(base) - 1)))
        spliced = bytes(base[:pos]) + data + bytes(base[pos:])
        out = decode_jpeg(spliced)
        assert out is None or isinstance(out, np.ndarray)


@settings(deadline=None, max_examples=60)
@given(
    w=hst.integers(min_value=1, max_value=40),
    h=hst.integers(min_value=1, max_value=40),
    seed=hst.integers(min_value=0, max_value=2**31),
    restart=hst.integers(min_value=1, max_value=9),
    color=hst.booleans(),
)
def test_jpeg_restart_and_color_paths(w, h, seed, restart, color):
    """DRI/RSTn restart markers (byte-align + DC-predictor reset) and
    the interleaved 3-component 4:4:4 color scan decode EXACTLY like
    the plain grayscale stream of the same luma plane."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_jpeg, encode_jpeg, encode_jpeg_color)

    rng = np.random.default_rng(seed)
    if color:
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
        luma = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b),
                       0, 255).astype(np.uint8)
        payload = encode_jpeg_color(rgb, 90, restart_interval=restart)
    else:
        luma = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        payload = encode_jpeg(luma, 90, restart_interval=restart)
    got = decode_jpeg(payload)
    want = decode_jpeg(encode_jpeg(luma, 90))
    assert got is not None and np.array_equal(got, want)


@settings(deadline=None, max_examples=80)
@given(
    w=hst.integers(min_value=1, max_value=40),
    h=hst.integers(min_value=1, max_value=40),
    seed=hst.integers(min_value=0, max_value=2**31),
    quality=hst.sampled_from([5, 25, 50, 75, 90, 100]),
    flavor=hst.sampled_from(["random", "constant", "gradient", "binary"]),
)
def test_jpeg_progressive_matches_baseline(w, h, seed, quality, flavor):
    """Progressive (SOF2: spectral selection x successive
    approximation) encodes the same quantized coefficients as
    baseline, so after all six scans decode_jpeg must be
    BYTE-IDENTICAL to the baseline decode at the same quality."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)

    rng = np.random.default_rng(seed)
    if flavor == "random":
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    elif flavor == "constant":
        img = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
    elif flavor == "gradient":
        img = (np.add.outer(np.arange(h), np.arange(w)) % 256
               ).astype(np.uint8)
    else:
        img = (rng.random((h, w)) < 0.1).astype(np.uint8) * 255
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    assert prog is not None
    assert np.array_equal(base, prog)


def test_jpeg_progressive_quarantine_paths():
    """Torn / truncated / bit-flipped progressive payloads return None
    or an array, never raise; dropping the final refinement scans
    still decodes (coarser approximation, same shape)."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_jpeg, encode_jpeg_progressive)

    img = (np.add.outer(np.arange(24), np.arange(32)) % 256).astype(
        np.uint8)
    payload = encode_jpeg_progressive(img, 90)
    full = decode_jpeg(payload)
    assert full is not None and full.shape == (24, 32)
    # torn anywhere: total function
    for cut in range(2, len(payload), max(1, len(payload) // 40)):
        out = decode_jpeg(payload[:cut])
        assert out is None or isinstance(out, np.ndarray)
    # a partial-progression prefix ending in EOI still decodes
    third_sos = [i for i in range(len(payload) - 1)
                 if payload[i:i + 2] == b"\xff\xda"][3]
    partial = decode_jpeg(payload[:third_sos] + b"\xff\xd9")
    assert partial is not None and partial.shape == (24, 32)
    assert not np.array_equal(partial, full)  # refinements matter
    # bit flips in the entropy tail: None or array, never a raise
    for pos in range(len(payload) - 60, len(payload) - 4, 5):
        bad = bytearray(payload)
        bad[pos] ^= 0x2A
        out = decode_jpeg(bytes(bad))
        assert out is None or isinstance(out, np.ndarray)


def test_jpeg_progressive_through_decode_stage(ray_session):
    """Progressive payloads flow through DecodeImageStage like
    baseline ones (same magic, same schema, no special-casing)."""
    import numpy as np
    import pyarrow as pa

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        DecodeImageStage, encode_jpeg_progressive)

    img = (np.add.outer(np.arange(16), np.arange(24)) % 256).astype(
        np.uint8)
    t = pa.table({"image": [encode_jpeg_progressive(img, 90), b"junk"]})
    out = DecodeImageStage()(t)
    assert out["width"].to_pylist() == [24, None]
    assert out["height"].to_pylist() == [16, None]


@settings(deadline=None, max_examples=40)
@given(
    w=hst.integers(min_value=1, max_value=40),
    h=hst.integers(min_value=1, max_value=40),
    seed=hst.integers(min_value=0, max_value=2**31),
    quality=hst.sampled_from([5, 50, 90, 100]),
)
def test_jpeg_progressive_color_matches_baseline_color(w, h, seed,
                                                       quality):
    """Multi-component progressive (interleaved DC scans + per-
    component AC bands) must decode the luma plane byte-identical to
    the baseline color encoding — this pins the decoder's
    multi-component progressive path, which grayscale streams never
    touch."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_jpeg, encode_jpeg_color, encode_jpeg_progressive_color)

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_color(rgb, quality))
    prog = decode_jpeg(encode_jpeg_progressive_color(rgb, quality))
    assert prog is not None
    assert np.array_equal(base, prog)


@settings(deadline=None, max_examples=40)
@given(
    w=hst.integers(min_value=1, max_value=40),
    h=hst.integers(min_value=1, max_value=40),
    seed=hst.integers(min_value=0, max_value=2**31),
    quality=hst.sampled_from([5, 50, 90]),
    restart=hst.integers(min_value=1, max_value=8),
)
def test_jpeg_progressive_restart_matches_baseline(w, h, seed, quality,
                                                   restart):
    """Progressive scans with DRI/RSTn restart markers (byte-align +
    predictor/EOB-run reset per T.81) must still decode byte-identical
    to the baseline encoding — pins the decoder's per-scan restart
    branch, which unrestarted streams never touch."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality))
    prog = decode_jpeg(encode_jpeg_progressive(
        img, quality, restart_interval=restart))
    assert prog is not None
    assert np.array_equal(base, prog)


@settings(deadline=None, max_examples=40)
@given(
    w=hst.integers(min_value=1, max_value=40),
    h=hst.integers(min_value=1, max_value=40),
    seed=hst.integers(min_value=0, max_value=2**31),
    quality=hst.sampled_from([5, 50, 90, 100]),
    restart=hst.sampled_from([0, 1, 3]),
)
def test_jpeg_420_matches_quantization_math(w, h, seed, quality,
                                            restart):
    """Baseline 4:2:0 (the layout most web JPEGs use): the decoded
    luma must EXACTLY equal the quantize-reconstruct math of the
    encoder's own 16-padded luma blocks (entropy layer lossless), and
    sit within +/-2 of the grayscale encode of the same luma (pure
    DCT float-order coefficient flips at .5 quantization
    boundaries)."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_jpeg, encode_jpeg, encode_jpeg_color_420)

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    r, g, b = [rgb[..., j].astype(np.float64) for j in range(3)]
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b),
                0, 255).astype(np.uint8)
    mrows, mcols = (h + 15) // 16, (w + 15) // 16
    ypad = np.pad(y, ((0, mrows * 16 - h), (0, mcols * 16 - w)),
                  mode="edge")
    ref = _jpeg_math_reference(ypad, quality)[:h, :w]
    got = decode_jpeg(encode_jpeg_color_420(
        rgb, quality, restart_interval=restart))
    assert got is not None
    assert np.array_equal(ref, got)
    base = decode_jpeg(encode_jpeg(y, quality))
    assert np.abs(base.astype(np.int64) - got.astype(np.int64)).max() <= 2


def test_jpeg_420_through_decode_stage(ray_session):
    import numpy as np
    import pyarrow as pa

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        DecodeImageStage, encode_jpeg_color_420)

    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, (18, 30, 3), dtype=np.uint8)
    t = pa.table({"image": [encode_jpeg_color_420(rgb, 85), b"junk"]})
    out = DecodeImageStage()(t)
    assert out["width"].to_pylist() == [30, None]
    assert out["height"].to_pylist() == [18, None]


@settings(deadline=None, max_examples=40)
@given(
    w=hst.integers(min_value=1, max_value=40),
    h=hst.integers(min_value=1, max_value=40),
    seed=hst.integers(min_value=0, max_value=2**31),
    quality=hst.sampled_from([5, 50, 90, 100]),
)
def test_jpeg_progressive_420_matches_baseline_420(w, h, seed, quality):
    """Progressive 4:2:0 — interleaved DC over 16x16 MCUs (four luma
    blocks mapped to the component raster grid) + per-component AC
    bands — must decode bit-identical to the baseline 4:2:0 encoding
    of the same pixels: the web's most common photo encoding,
    end-to-end."""
    import numpy as np

    from bitquery_kafka_streams_rust_ray.stages.multimodal import (
        decode_jpeg, encode_jpeg_color_420, encode_jpeg_progressive_420)

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_color_420(rgb, quality))
    prog = decode_jpeg(encode_jpeg_progressive_420(rgb, quality))
    assert prog is not None
    assert np.array_equal(base, prog)
