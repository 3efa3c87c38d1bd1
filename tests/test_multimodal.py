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
