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
